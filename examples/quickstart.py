"""Quickstart: xKV cross-layer-SVD compressed KV-cache inference.

Builds a small random Llama-shaped model, prefills a prompt, compresses the
KV cache with the xKV-4 scheme (group of 4 layers, shared SVD factors), and
greedy-decodes — comparing against the uncompressed baseline.

Run:  python examples/quickstart.py
"""

import time

import jax
import jax.numpy as jnp

from xkv_tpu import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    cfg = tiny_llama_config(
        num_layers=8, hidden_size=256, intermediate_size=512,
        num_q_heads=8, num_kv_heads=4, head_dim=32, vocab_size=1024,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=-1, group_size=4,
        rank_k=64, rank_v=96,
    )

    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 512), 0, cfg.vocab_size)

    # rank-space decode variant (docs/ROPE_MODES.md): rotate keys before
    # the SVD; decode never reconstructs. int8 factors for extra headroom.
    xkv_post = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=-1, group_size=4,
        rank_k=64, rank_v=96, extra_kwargs={"rope_mode": "post"},
    )

    runs = [
        ("none", None, {}),
        ("factored", xkv, {}),
        ("fake", xkv, {}),
        ("factored", xkv_post, {"factor_dtype": "int8",
                                "_label": "rope=post int8"}),
    ]
    for mode, xcfg, extra in runs:
        label = extra.pop("_label", mode)
        eng = InferenceEngine(params, cfg, xkv=xcfg, mode=mode, tail_max=64,
                              **extra)
        t0 = time.perf_counter()
        _, cache = eng.prefill(prompt)
        jax.block_until_ready(cache.tail_k)
        t1 = time.perf_counter()
        out = eng.generate(prompt, max_new_tokens=32)
        out = jax.device_get(out)
        t2 = time.perf_counter()
        ratio = cache.compression_ratio(cfg)
        print(
            f"mode={label:16s} prefill+compress {t1-t0:6.2f}s  "
            f"generate(32) {t2-t1:6.2f}s  KV compression {ratio:5.2f}x  "
            f"tokens {out[0][:8].tolist()}..."
        )


if __name__ == "__main__":
    main()
