from xkv_tpu.evalharness.dataset import Dataset  # noqa: F401
from xkv_tpu.evalharness.evaluator import Evaluator  # noqa: F401
