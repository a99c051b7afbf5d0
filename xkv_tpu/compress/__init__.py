from xkv_tpu.compress.svd import (  # noqa: F401
    LowRankFactors,
    truncated_svd,
    randomized_svd,
    factorize,
    reconstruct,
    fake_svd,
)
from xkv_tpu.compress.slerp import (  # noqa: F401
    slerp_merge_rows,
    minicache_merge,
)
