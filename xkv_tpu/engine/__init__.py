from xkv_tpu.engine.engine import InferenceEngine  # noqa: F401
