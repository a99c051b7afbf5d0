"""Continuous-batching serving demo: many requests, few slots.

Requests with different prompt lengths flow through a 2-slot BatchedEngine
with bucketed prefill admission; finished slots are recycled immediately.
A second pass reruns the same requests with batched speculative decoding
(sparse drafts + one exact multi-token verify per round, per-slot
acceptance) and checks the outputs are bit-identical.

Run:  python examples/serving.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xkv_tpu import generate_consecutive_xkv_config
from xkv_tpu.engine.batching import BatchedEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params


def main():
    cfg = tiny_llama_config(
        num_layers=4, hidden_size=128, intermediate_size=256,
        num_q_heads=8, num_kv_heads=4, head_dim=16, vocab_size=512,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=-1, group_size=2,
        rank_k=32, rank_v=32,
    )
    be = BatchedEngine(
        params, cfg, xkv=xkv, num_slots=2, s_max=128, tail_max=16,
        prefill_buckets=[32, 64, 128],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    n_requests = 6
    for i in range(n_requests):
        n = int(rng.integers(16, 100))
        prompt = rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
        rid = be.submit(prompt, max_new_tokens=int(rng.integers(4, 12)))
        print(f"submitted request {rid}: prompt_len={n}")

    t0 = time.perf_counter()
    done = be.run()
    dt = time.perf_counter() - t0
    total_tokens = sum(len(r.generated) for r in done)
    print(f"\nfinished {len(done)} requests, {total_tokens} tokens in {dt:.2f}s")
    for r in sorted(done, key=lambda r: r.request_id):
        print(f"  request {r.request_id}: {len(r.generated)} tokens -> "
              f"{r.generated[:6]}...")

    # Same requests through batched speculative decoding: bit-exact output.
    be_spec = BatchedEngine(
        params, cfg, xkv=xkv, num_slots=2, s_max=128, tail_max=16,
        prefill_buckets=[32, 64, 128],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        sparse_topk=2, sparse_block=32, speculative_k=4,
    )
    rng = np.random.default_rng(0)
    for i in range(n_requests):
        n = int(rng.integers(16, 100))
        prompt = rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
        be_spec.submit(prompt, max_new_tokens=int(rng.integers(4, 12)))
    done_spec = {r.request_id: r.generated for r in be_spec.run()}
    plain = {r.request_id: r.generated for r in done}
    assert done_spec == plain
    print(f"speculative serving (k=4): same {len(done_spec)} requests, "
          "bit-exact tokens")


if __name__ == "__main__":
    main()
