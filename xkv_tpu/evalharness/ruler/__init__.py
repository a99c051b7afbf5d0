from xkv_tpu.evalharness.ruler.tasks import SYNTHETIC_TASKS, TASKS  # noqa: F401
from xkv_tpu.evalharness.ruler.generators import generate_task  # noqa: F401
