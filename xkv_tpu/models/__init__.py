from xkv_tpu.models.config import ModelConfig  # noqa: F401
