"""xkv_tpu — TPU-native long-context inference with cross-layer SVD KV compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the xKV
reference (arXiv:2503.18893). Unlike the reference — which reconstructs a
full-size lossy KV cache ("fake" compression, see reference
xKV/customized_cache/fake_layer_merge_dynamic_cache.py:202-213) — this
framework stores the KV cache of layer groups as low-rank SVD factors and
reads them through fused attention that performs the reconstruction inline.

Layout:
  configs        — xKV merge-plan config (YAML schema compatible with the
                   reference's xKV/configurations.py)
  compress/      — SVD (exact + randomized) and SLERP merge numerics
  ops/           — RoPE, attention (XLA reference paths + Pallas kernels)
  cache          — compressed KV cache pytrees (factored + dense tail)
  models/        — pure-JAX model definitions (Llama family, DeepSeek MLA)
  parallel/      — mesh / sharding rules (pjit, GSPMD)
  engine/        — prefill/decode inference engine, generation loop
  evalharness/   — RULER + LongBench + perplexity evaluation harness
  cli/           — command-line entry points mirroring the reference flags
"""

import os as _os

if _os.environ.get("XKV_FORCE_CPU"):
    # The axon TPU shim force-sets jax_platforms at interpreter start, so
    # JAX_PLATFORMS=cpu alone cannot keep CPU-side tooling (data prep,
    # corpus generation, smokes) off the tunneled chip while it is busy
    # benchmarking/training. Explicit opt-out, applied before any backend
    # initializes (tests/conftest.py uses the same workaround).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


__version__ = "0.1.0"

from xkv_tpu.configs import (  # noqa: F401
    LayerGroup,
    XKVConfig,
    generate_consecutive_layer_groups,
    generate_consecutive_xkv_config,
)
