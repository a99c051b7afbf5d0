"""On-chip drive: rope_mode="post" rank-space kernel on the real TPU.

Verifies (1) the Mosaic compile of ops/pallas/rankspace_attention.py,
(2) greedy-token agreement between post-mode pallas decode and the XLA
rank-space path, and (3) a paired-length timing of both rope modes at a
serving-ish shape. Small geometry: fast compile, still exercises
rank/lane tiling (hd=128, rk/rv multiples of 128).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 560 python scripts/drive_rope_post_tpu.py
"""

import time

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.models.llama import init_params


def main():
    print("backend:", jax.default_backend(), jax.devices())
    cfg = ModelConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=128,
        rope_theta=10000.0,
    )
    ctx, steps, batch = 4096, 8, 4
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, ctx), 0,
                                cfg.vocab_size)

    def make_eng(mode, impl, factor_dtype="int8"):
        xkv = generate_consecutive_xkv_config(
            num_layers=cfg.num_layers, end_layer=-1, group_size=2,
            rank_k=128, rank_v=128, extra_kwargs={"rope_mode": mode},
        )
        return InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=steps + 8,
            attention_impl=impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
        )

    def gen(eng, b):
        logits, cache = eng.prefill(prompt)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        if b > 1:
            cache = cache.tile_batch(b)
            tok = jnp.tile(tok, (b,))
        pos = jnp.asarray(ctx, jnp.int32)
        cos_sin = eng._prefill_cos_sin(cache.prefill_len)
        fn = jax.jit(lambda c, p, t, q, cs: eng._generate_impl(
            c, p, t, q, cs, n_steps=steps)[0])
        t0 = time.perf_counter()
        toks = jax.device_get(fn(cache, eng.params, tok, pos, cos_sin))
        dt = time.perf_counter() - t0
        return toks, dt

    toks_pallas, t1 = gen(make_eng("post", "pallas"), 1)
    toks_xla, t2 = gen(make_eng("post", "xla"), 1)
    agree = float((toks_pallas == toks_xla).mean())
    print(f"post pallas vs xla greedy agreement: {agree:.3f} "
          f"({steps} steps)")
    assert agree >= 0.99, (toks_pallas, toks_xla)

    # Paired-length timing at batch (incl. compile on first call; second
    # call with distinct tokens gives the steady-ish number).
    for mode in ("post", "pre"):
        eng = make_eng(mode, "pallas")
        _, t_warm = gen(eng, batch)
        _, t_run = gen(eng, batch)  # re-prefill too; coarse but comparable
        print(f"rope={mode}: warm {t_warm:.2f}s, rerun {t_run:.2f}s "
              f"({batch} slots x {steps} steps + prefill)")
    print("drive OK")


if __name__ == "__main__":
    main()
