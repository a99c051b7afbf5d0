from xkv_tpu.parallel.mesh import make_mesh  # noqa: F401
from xkv_tpu.parallel.sharding import (  # noqa: F401
    cache_pspecs,
    param_pspecs,
    shard_params,
)
