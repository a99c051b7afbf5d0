"""Train and checkpoint the production-geometry study model for the full
offline RULER suite (VERDICT r3 #2).

Reuses the validated curriculum of scripts/rope_mode_study_production.py
(random-distance copy induction, production KV geometry: 8 kv heads x
head_dim 128, group-4 matrix (s, 4096)), then adds a DEEP-RETRIEVAL
fine-tune the study did not need: multi-token needles planted at random
depths across the WHOLE context with the loss on the value tokens. The
study's copy curriculum only trains retrieval distances <= TRAIN_DIST
(1024); RULER niah plants needles at 40 depth buckets over the full 64K
context (reference `evaluate/data/ruler/synthetic/niah.py:99`), so the
eval model must retrieve at distances up to the context length. Needle
tokens are drawn from the NOISE range — exactly the regime of byte-level
RULER text, where needles are ordinary byte strings with no reserved
vocabulary (utils/tokenizer.py ByteTokenizer ids 3..258 all fall in the
model's noise range).

The checkpoint lands in results/production_model/ (params.npz +
config.json, models/ckpt.py) and is consumed by
`cli/eval_acc.py --model ckpt:results/production_model`.

Run on the real TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_production_model.py
"""

import argparse
import os
import sys
import time

import numpy as np

import jax

# The axon TPU shim force-sets jax_platforms at interpreter start, so
# JAX_PLATFORMS=cpu alone does not keep CPU-side runs off the tunneled
# chip (tests/conftest.py has the same workaround).
if os.environ.get("XKV_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import rope_mode_study_production as study  # noqa: E402

from xkv_tpu.models.ckpt import save_checkpoint  # noqa: E402
from xkv_tpu.models.llama import init_params  # noqa: E402
from xkv_tpu.train.lm import train_lm  # noqa: E402

NEEDLE_KEY, NEEDLE_VAL = 4, 4


def make_deep_needle_batch(rng, batch, L, n_needles=8, n_query=4):
    """Full-depth retrieval batch: 8-token needles (4-token key prefix +
    4-token value) at random segment-aligned depths across the ENTIRE
    context; the prompt ends with one needle's key and the loss covers its
    value tokens. Unlike study.make_needle_train_batch (bigram needles from
    a reserved range, used only as a competence probe), keys/values come
    from the noise range — collisions with noise are vanishingly rare
    (510^-4 per position) and this matches byte-level RULER text.

    ``n_query`` needles are queried back-to-back at the end ([k1 v1 k2 v2
    ...]) — 4x the per-sequence loss signal of a single query, which is
    what keeps the long-L stages stable at batch 1 (a single 4-token
    answer per 16K tokens starves the gradient)."""
    seg = NEEDLE_KEY + NEEDLE_VAL
    lo, hi = study.NOISE_LO, study.NOISE_HI
    n_query = min(n_query, n_needles)
    toks = rng.integers(lo, hi, size=(batch, L + 1)).astype(np.int32)
    toks[:, 0] = 1
    mask = np.zeros((batch, L + 1), np.float32)
    q_at = L + 1 - n_query * seg
    for i in range(batch):
        depths = rng.choice(
            np.arange(1, (q_at - seg) // seg), size=n_needles, replace=False
        ) * seg
        needles = rng.integers(lo, hi, size=(n_needles, seg))
        for nd, d in zip(needles, depths):
            toks[i, d: d + seg] = nd
        picks = rng.choice(n_needles, size=n_query, replace=False)
        for qi, j in enumerate(picks):
            at = q_at + qi * seg
            toks[i, at:at + seg] = needles[j]
            mask[i, at + NEEDLE_KEY:at + seg] = 1.0
    return toks, mask


def deep_needle_probe(params, L, n=8, seed=123):
    """Greedy full-depth retrieval accuracy (uncompressed cache): fraction
    of value tokens reproduced when needles sit anywhere in the context."""
    rng = np.random.default_rng(seed)
    toks, _ = make_deep_needle_batch(rng, n, L)
    prompts = toks[:, : L + 1 - NEEDLE_VAL]
    answers = toks[:, L + 1 - NEEDLE_VAL:]
    eng = study.make_engine(params, None, tail=NEEDLE_VAL + 2)
    out = np.asarray(
        eng.generate(jnp.asarray(prompts), max_new_tokens=NEEDLE_VAL)
    )
    return float((out == answers).mean())


FILLER = ("The grass is green. The sky is blue. The sun is yellow. "
          "Here we go. There and back again.\n")

# Task families with retrieval-shaped answers a 4-layer induction model can
# learn from format exposure (find the key, emit the value / chain). The
# aggregation tasks (cwe/fwe: global counting) and language QA stay out of
# the fine-tune corpus — their pipeline still runs in the e2e suite and the
# uncompressed baseline column shows the model's (absent) competence there.
FORMAT_TASKS = (
    "niah_single_1", "niah_single_2", "niah_single_3",
    "niah_multikey_1", "niah_multivalue", "niah_multiquery", "vt",
)


def build_format_corpus(lengths=(2048, 4096, 8192), n_per=8, seed=0,
                        tasks=FORMAT_TASKS):
    """Byte-tokenized RULER-format training rows, bucketed by length.

    Uses the REAL generators (evalharness/ruler/generators.py) at short
    contexts so the model learns the prompt format ("...magic number for
    {key} ... is: {value}" + question -> answer) with the loss on the
    answer bytes only; the deep-needle stage supplies the long-distance
    retrieval circuit the format then routes through. Rows are front-padded
    with haystack filler to the bucket length (RoPE is relative; leading
    filler is exactly more haystack)."""
    from xkv_tpu.evalharness.ruler.generators import generate_task
    from xkv_tpu.utils.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    buckets = {}
    for L in lengths:
        rows = []
        for ti, task in enumerate(tasks):
            try:
                gen = generate_task(
                    task, tokenizer=tok, max_seq_length=L - 64,
                    num_samples=n_per, random_seed=seed + 101 * ti + L,
                )
            except Exception as e:  # qa corpora etc. — skip, not fatal
                print(f"  corpus {task}@{L}: skipped ({e})", flush=True)
                continue
            for r in gen:
                ans = " " + " ".join(str(o) for o in r["outputs"]) + "."
                inp = tok.encode(r["input"])
                tgt = tok.encode(ans)
                pad_n = L - len(inp) - len(tgt)
                if pad_n < 0:
                    inp = inp[-(L - len(tgt)):]
                    pad_n = 0
                pad = (tok.encode(FILLER * (pad_n // len(FILLER) + 1)))[:pad_n]
                toks = np.asarray(
                    [1] + pad + inp + tgt, np.int32
                )  # (L + 1,)
                mask = np.zeros(L + 1, np.float32)
                mask[L + 1 - len(tgt):] = 1.0
                rows.append((toks, mask))
        if rows:
            buckets[L] = rows
    return buckets


def make_format_batch(rng, corpus_rows, batch):
    idx = rng.integers(len(corpus_rows), size=batch)
    toks = np.stack([corpus_rows[i][0] for i in idx])
    mask = np.stack([corpus_rows[i][1] for i in idx])
    return toks, mask


def ruler_format_probe(params, corpus_rows, n=8, seed=5):
    """Greedy answer-byte accuracy on held-out-ish format rows."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(len(corpus_rows), size=n)
    hits = tot = 0
    for i in idx:
        toks, mask = corpus_rows[i]
        n_ans = int(mask.sum())
        eng = study.make_engine(params, None, tail=n_ans + 2)
        prompt = toks[None, :-n_ans]
        out = np.asarray(
            eng.generate(jnp.asarray(prompt), max_new_tokens=n_ans)
        )[0]
        hits += int((out == toks[-n_ans:]).sum())
        tot += n_ans
    return hits / max(tot, 1)


def train(rows: int, quick: bool = False, seed_tries: int = 8,
          copy_ckpt: str = None):
    """Copy curriculum (study recipe) + deep-retrieval fine-tune."""
    t0 = time.time()
    rng = np.random.default_rng(0)
    params = None
    if copy_ckpt and os.path.isdir(copy_ckpt):
        from xkv_tpu.models.ckpt import load_checkpoint

        params, _ = load_checkpoint(copy_ckpt)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
        print(f"resumed copy-curriculum params from {copy_ckpt}", flush=True)
    if params is None:
        for seed in range(seed_tries):
            rng = np.random.default_rng(seed)
            params = init_params(
                study.CFG, jax.random.PRNGKey(seed), dtype=jnp.float32
            )
            params, history = train_lm(
                params, study.CFG,
                lambda i: study.make_induction_batch(rng, 64, 64),
                steps=300 if quick else 2500, lr=2e-3,
                log_every=1250, verbose=True,
            )
            print(f"seed {seed} stage L=64: loss {history[-1]:.4f}",
                  flush=True)
            if history[-1] < 0.5 or quick:
                break  # quick mode smokes the plumbing, not the competence
        else:
            raise RuntimeError("induction never formed over the seed list")

        copy_stages = [(256, 600, 5e-4, 16), (1024, 400, 2e-4, 8),
                       (2048, 250, 1e-4, 4), (4096, 120, 1e-4, 2),
                       (8192, 80, 5e-5, 1), (16384, 60, 5e-5, 1)]
        for L, steps, lr, b in copy_stages:
            if L > rows:
                continue
            if quick:
                steps = max(10, steps // 10)
            params, history = train_lm(
                params, study.CFG,
                lambda i, L=L, b=b: study.make_induction_batch(
                    rng, b, L, m_min=min(64, L // 4),
                    m_max=min(study.TRAIN_DIST, L // 2)),
                steps=steps, lr=lr, log_every=max(25, steps // 2),
                verbose=True,
            )
            print(f"copy stage L={L}: loss {history[-1]:.4f}", flush=True)
        if copy_ckpt:
            save_checkpoint(copy_ckpt, params, study.CFG)
            print(f"copy-curriculum checkpoint -> {copy_ckpt}", flush=True)

    # Deep-retrieval fine-tune: random-depth needles over the whole
    # context. Measured over two full runs: retrieval forms solidly at
    # L=2048 (probe acc 0.94) and partially at 4096; stages at 8K+ sit at
    # the unigram loss and ERASE earlier competence (and 32K training hits
    # the chip's compile-memory ceiling). So training stops at 4K — the
    # model's retrieval competence is the most recent ~2-4K of context; at
    # the 64K eval both the compressed and uncompressed columns share that
    # boundary and the niah heatmap shows it as a recency band
    # (docs/RULER_OFFLINE.md).
    needle_stages = [(2048, 250, 1e-4, 4), (4096, 300, 3e-5, 2)]
    for L, steps, lr, b in needle_stages:
        if L > rows:
            continue
        if quick:
            steps = max(10, steps // 10)
        params, history = train_lm(
            params, study.CFG,
            lambda i, L=L, b=b: make_deep_needle_batch(rng, b, L),
            steps=steps, lr=lr, log_every=max(20, steps // 2), verbose=True,
        )
        acc = deep_needle_probe(params, L, n=4 if quick else 8)
        print(f"needle stage L={L}: loss {history[-1]:.4f} "
              f"deep-retrieval acc {acc:.3f}", flush=True)

    # RULER byte-format fine-tune: real generator output at short contexts
    # teaches the answer-prefix format; interleave deep-needle batches so
    # the long-distance circuit is not forgotten.
    fmt_lengths = (1024, 2048) if quick else (2048, 4096)
    corpus = build_format_corpus(
        lengths=fmt_lengths, n_per=4 if quick else 24, seed=1
    )
    fmt_schedule = {1024: (20, 1e-4, 8), 2048: (900, 1e-4, 8),
                    4096: (400, 5e-5, 4)}
    for L in sorted(corpus):
        steps, lr, b = fmt_schedule[L]
        if quick:
            steps = 20
        params, history = train_lm(
            params, study.CFG,
            lambda i, L=L, b=b: (
                make_format_batch(rng, corpus[L], b) if i % 4
                else make_deep_needle_batch(rng, b, L)
            ),
            steps=steps, lr=lr,
            log_every=max(20, steps // 4), verbose=True,
        )
        acc = ruler_format_probe(params, corpus[L], n=3 if quick else 8)
        print(f"format stage L={L}: loss {history[-1]:.4f} "
              f"format-answer acc {acc:.3f}", flush=True)

    print(f"trained in {time.time() - t0:.0f}s", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--out", default="results/production_model")
    ap.add_argument("--quick", action="store_true",
                    help="CPU smoke: tiny step counts")
    ap.add_argument("--copy-ckpt", default=None,
                    help="save/resume the copy-curriculum stage here "
                    "(retries skip ~10 min of curriculum)")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)
    params = train(args.rows, quick=args.quick, copy_ckpt=args.copy_ckpt)
    save_checkpoint(args.out, params, study.CFG)
    print(f"checkpoint saved to {args.out}", flush=True)


if __name__ == "__main__":
    main()
