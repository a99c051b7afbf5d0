from xkv_tpu.train.compressors import (  # noqa: F401
    ConvCompressor,
    EnhancedConvCompressor,
    Dual1DConvCompressor,
    VAEConvCompressor,
    IdentityCompressor,
    make_compressor,
)
from xkv_tpu.train.trainer import CompressorTrainer, TrainConfig  # noqa: F401
