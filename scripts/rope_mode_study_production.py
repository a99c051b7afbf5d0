"""Production-geometry accuracy study: pre-RoPE vs post-RoPE factorization.

Round-3 follow-up to scripts/rope_mode_study.py (VERDICT r2 #1): the same
offline methodology, scaled to the xKV-4 production KV geometry so the
rope_mode="post" accuracy case is load-bearing at the shape the serving
headline is measured at (BASELINE.md):

  * head_dim 128, 8 KV heads, layer group 4 -> the factored group matrix
    is (rows, 4*8*128 = 4096), exactly Llama-3.1-8B xKV-4's;
  * rank_k 512 / rank_v 768 (the paper's 8x operating point,
    reference README.md:87-88) plus a 2x-beyond point (256/384);
  * >= 16K factored rows per sequence;
  * three task families from ONE trained model:
      1. ordered recall  — greedy copy-continuation of an 8K repeated
         segment (exact-match rate over generated tokens);
      2. multi-needle    — 8 key->value needles planted at random depths
         in 16K of noise, needle keys drawn from a held-out vocab range
         (unique occurrence); query one needle per sequence, check the
         retrieved value token (niah's mechanism);
      3. teacher-forced NLL — mean next-token negative log-likelihood of
         the first 256 tokens of the repeated half through the compressed
         cache (perplexity-under-compression; engine.score = RNN mode,
         reference eval_perplexity_rnn.py:90-125).

The model is a 4-layer transformer with the production KV shape
(8 q/kv heads x head_dim 128, llama-3 rope theta 5e5; narrow hidden-128
trunk — KV geometry, not trunk width, is what the compression math sees)
trained on a random-distance copy task (content-addressed induction;
RoPE scores depend on relative offsets only, so the circuit transfers to
16K-row contexts exactly). The uncompressed baseline column verifies the
model's own competence independently of any compression claim.

Run on the real TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/rope_mode_study_production.py

Results are recorded in docs/ROPE_MODES.md ("Production-geometry study").
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from xkv_tpu.configs import generate_consecutive_xkv_config  # noqa: E402
from xkv_tpu.engine import InferenceEngine  # noqa: E402
from xkv_tpu.models.config import tiny_llama_config  # noqa: E402
from xkv_tpu.models.llama import init_params  # noqa: E402
from xkv_tpu.train.lm import train_lm  # noqa: E402

# Production KV geometry: (s, 4*8*128) group matrix, same as Llama-3.1-8B
# xKV-4. Query-head count does not enter the compression math (the factored
# matrix is KV-side); hq=hkv keeps the trainable model small.
CFG = tiny_llama_config(
    vocab_size=1024,
    hidden_size=128,
    intermediate_size=256,
    num_layers=4,
    num_q_heads=8,
    num_kv_heads=8,
    head_dim=128,
    rope_theta=500000.0,
)
NOISE_LO, NOISE_HI = 2, 512       # noise token range
NEEDLE_LO, NEEDLE_HI = 512, 1024  # held-out needle key/value range
TRAIN_DIST = 1024                 # max trained copy distance


def make_induction_batch(rng, batch, L, m_min=8, m_max=None):
    """[BOS, noise, x(m), x(m)] with loss on the second copy (from its 2nd
    token) and the copy distance ``m`` RANDOM per sample.

    A fixed distance lets the model learn a positional shortcut (attend to
    position p-M) instead of content matching — measured: a fixed-M=64
    model hits loss 11.5 (confidently wrong) at M=256 and curriculum
    training erases rather than extends it. Random distances force the
    content-addressed induction circuit, which transfers across lengths.
    """
    m_max = m_max or L // 2
    toks = rng.integers(NOISE_LO, NEEDLE_HI,
                        size=(batch, L + 1)).astype(np.int32)
    toks[:, 0] = 1
    mask = np.zeros((batch, L + 1), np.float32)
    for i in range(batch):
        m = int(rng.integers(m_min, m_max + 1))
        x = rng.integers(NOISE_LO, NEEDLE_HI, size=(m,))
        toks[i, L + 1 - 2 * m: L + 1 - m] = x
        toks[i, L + 1 - m:] = x
        mask[i, L + 2 - m:] = 1.0  # from the 2nd copied token (predictable)
    return toks, mask


def make_needle_train_batch(rng, batch, L, n_needles=8):
    """Needle-retrieval training: (key, value) bigrams planted at RANDOM
    depths across the whole context, query key at the second-to-last
    position, loss only on the answer token. Trains content retrieval at
    every relative distance up to L."""
    toks = rng.integers(NOISE_LO, NOISE_HI, size=(batch, L + 1)).astype(np.int32)
    toks[:, 0] = 1
    mask = np.zeros((batch, L + 1), np.float32)
    for i in range(batch):
        keys = rng.choice(np.arange(NEEDLE_LO, NEEDLE_HI), size=n_needles,
                          replace=False)
        vals = rng.integers(NEEDLE_LO, NEEDLE_HI, size=n_needles)
        depths = rng.choice(np.arange(1, L - 3), size=n_needles, replace=False)
        for k, v, d in zip(keys, vals, depths):
            toks[i, d] = k
            toks[i, d + 1] = v
        j = int(rng.integers(n_needles))
        toks[i, L - 1] = keys[j]
        toks[i, L] = vals[j]
        mask[i, L] = 1.0
    return toks, mask


def make_mixed_batch(rng, batch, L, needle_frac=0.5, m_max=None):
    """Per-SAMPLE mix of copy (ordered recall / NLL competence) and needle
    (multi-needle competence at all depths) in one batch — per-step task
    alternation destabilizes early training (measured: loss plateaus at
    the needle-answer entropy); within-batch mixing keeps both gradients
    present every step. Used only after the copy stages form the
    induction circuit."""
    tc, mc = make_induction_batch(rng, batch, L, m_max=m_max)
    tn, mn = make_needle_train_batch(rng, batch, L)
    pick = (rng.random(batch) < needle_frac)[:, None]
    return np.where(pick, tn, tc), np.where(pick, mn, mc).astype(np.float32)


def xkv_with(rank_k, rank_v, mode):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=4, rank_k=rank_k, rank_v=rank_v,
        extra_kwargs={"rope_mode": mode},  # svd_method: randomized default
    )


def make_engine(params, xkv, tail, factor_dtype=jnp.float32):
    return InferenceEngine(
        params, CFG, xkv=xkv, mode="factored" if xkv is not None else "none",
        tail_max=tail, donate_cache=False,
        attention_impl="pallas" if jax.default_backend() == "tpu" else "xla",
        cache_dtype=jnp.bfloat16, factor_dtype=factor_dtype,
        prefill_logits="last",
    )


# ------------------------------------------------------------------ tasks
#
# All three tasks keep the retrieval distance within the model's trained
# competence (TRAIN_DIST) while the CACHE holds the full ``rows`` — the
# claim under test is what compressing a 16K-row cache does to retrieval,
# not whether a toy model extrapolates rope distances; the uncompressed
# baseline column makes any model limitation visible separately.
def ordered_recall(params, xkv, rows, n, m=TRAIN_DIST, keep=8, gen=64,
                   seed=7, factor_dtype=jnp.float32):
    """Copy-continuation: [BOS, noise, x(m), x(:keep)] at ``rows`` total
    rows; greedy continuation must reproduce x[keep:]."""
    rng = np.random.default_rng(seed)
    noise_len = rows - 1 - m - keep
    noise = rng.integers(NOISE_LO, NOISE_HI, size=(n, noise_len))
    x = rng.integers(NOISE_LO, NEEDLE_HI, size=(n, m)).astype(np.int32)
    prompts = np.concatenate(
        [np.ones((n, 1), np.int32), noise.astype(np.int32), x, x[:, :keep]],
        axis=1,
    )
    eng = make_engine(params, xkv, tail=gen + 2, factor_dtype=factor_dtype)
    out = np.asarray(eng.generate(jnp.asarray(prompts), max_new_tokens=gen))
    return float((out == x[:, keep:keep + gen]).mean())


NEEDLE_KEY, NEEDLE_VAL = 4, 4  # needle = key-prefix + value segment


def needle_prompts(rng, n, ctx, n_needles):
    """Noise contexts with ``n_needles`` planted 8-token needles (4-token
    key prefix + 4-token value, needle-range tokens) at distinct random
    depths; the prompt ends with one needle's key prefix and the model
    must reproduce its value segment (niah's retrieve-the-planted-fact
    mechanism, expressed through the same content-addressed continuation
    the model is trained for). Returns (prompts (n, 1+ctx+KEY),
    answers (n, VAL))."""
    seg = NEEDLE_KEY + NEEDLE_VAL
    toks = rng.integers(NOISE_LO, NOISE_HI, size=(n, ctx)).astype(np.int32)
    answers = np.zeros((n, NEEDLE_VAL), np.int32)
    queried = np.zeros((n, NEEDLE_KEY), np.int32)
    for i in range(n):
        # depths span the final trained-distance window (retrieval stays
        # in the circuit's competence; the cache still holds all ctx rows)
        d0 = max(1, ctx - TRAIN_DIST)
        depths = rng.choice(
            np.arange(d0 // seg, (ctx - seg) // seg),
            size=n_needles, replace=False,
        ) * seg  # segment-aligned: needles never overlap
        needles = rng.integers(NEEDLE_LO, NEEDLE_HI,
                               size=(n_needles, seg))
        for nd, d in zip(needles, depths):
            toks[i, d: d + seg] = nd
        j = i % n_needles  # rotate the queried needle across sequences
        queried[i] = needles[j][:NEEDLE_KEY]
        answers[i] = needles[j][NEEDLE_KEY:]
    prompts = np.concatenate(
        [np.ones((n, 1), np.int32), toks, queried], axis=1
    )
    return prompts, answers


def multi_needle(params, xkv, ctx, n, n_needles=8, seed=11,
                 factor_dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    prompts, answers = needle_prompts(rng, n, ctx, n_needles)
    eng = make_engine(params, xkv, tail=NEEDLE_VAL + 2,
                      factor_dtype=factor_dtype)
    out = np.asarray(eng.generate(jnp.asarray(prompts),
                                  max_new_tokens=NEEDLE_VAL))
    return float((out == answers).mean())


def teacher_forced_nll(params, xkv, rows, n, m=TRAIN_DIST, n_score=256,
                       seed=13, factor_dtype=jnp.float32):
    """Mean next-token NLL of the first n_score tokens of the repeat,
    through the compressed cache (decode-path RNN scoring). Layout:
    prefill [BOS, noise, x(m)] (= rows rows), then feed x as the
    continuation."""
    rng = np.random.default_rng(seed)
    noise_len = rows - 1 - m
    noise = rng.integers(NOISE_LO, NOISE_HI, size=(n, noise_len))
    x = rng.integers(NOISE_LO, NEEDLE_HI, size=(n, m)).astype(np.int32)
    prompts = np.concatenate(
        [np.ones((n, 1), np.int32), noise.astype(np.int32), x], axis=1
    )
    eng = make_engine(params, xkv, tail=n_score + 2,
                      factor_dtype=factor_dtype)
    _, cache = eng.prefill(jnp.asarray(prompts))
    # feed x[0..n_score-1] (the start of the repeat), score each next token
    fed = jnp.asarray(x[:, :n_score])
    logp, _ = eng.score(cache, fed, jnp.asarray(prompts.shape[1], jnp.int32))
    logp = np.asarray(logp)  # (n, n_score, vocab): log p(next | fed[:, :i+1])
    tgt = x[:, 1:n_score]    # token after fed[:, i], i < n_score-1
    rows = np.arange(n)[:, None]
    steps = np.arange(n_score - 1)[None, :]
    return float(np.mean(-logp[rows, steps, tgt]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384,
                    help="factored rows per sequence (context length)")
    ap.add_argument("--train-steps", type=int, default=60)
    ap.add_argument("--n", type=int, default=8, help="sequences per task")
    ap.add_argument("--ranks", default="512:768,256:384",
                    help="rank_k:rank_v points, comma-separated")
    ap.add_argument("--modes", default="pre,post,post-int8,post-int4")
    ap.add_argument("--skip-nll", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    # Induction formation is a known training lottery (~1/3 of seeds
    # plateau at the unigram loss on this task); retry the first stage
    # over a deterministic seed list until the circuit forms.
    for seed in range(8):
        rng = np.random.default_rng(seed)
        params = init_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)
        params, history = train_lm(
            params, CFG,
            lambda i: make_induction_batch(rng, 64, 64),
            steps=2500, lr=2e-3, log_every=1250, verbose=True,
        )
        print(f"seed {seed} stage L=64: loss {history[-1]:.4f}", flush=True)
        if history[-1] < 0.5:
            break
    else:
        raise RuntimeError("induction never formed over 8 seeds")
    # Length curriculum with RANDOM per-sample copy distances (see
    # make_induction_batch): short lengths form the content-addressed
    # circuit quickly; longer stages extend it to production distances.
    # (Recipe validated 2026-08-21: final-stage loss ~0.19; a narrow
    # residual trunk trains the circuit where hidden 1024 plateaus, and
    # KV geometry — the thing the study measures — is unchanged.)
    # Pure-copy curriculum (needle mixing destabilizes the long stages —
    # measured; the copy-trained circuit generalizes to needle retrieval).
    # Long stages cap the copy distance at TRAIN_DIST: distance growth
    # beyond it (m_max = L/2 at L >= 8K) collapses training.
    stages = [(256, 600, 5e-4, 16), (1024, 400, 2e-4, 8),
              (2048, 250, 1e-4, 4), (4096, 120, 1e-4, 2),
              (8192, 80, 5e-5, 1), (16384, args.train_steps, 5e-5, 1)]
    for L, steps, lr, b in stages:
        if L > args.rows:
            continue
        params, history = train_lm(
            params, CFG,
            lambda i, L=L, b=b: make_induction_batch(
                rng, b, L, m_min=min(64, L // 4),
                m_max=min(TRAIN_DIST, L // 2)),
            steps=steps, lr=lr, log_every=max(25, steps // 2), verbose=True,
        )
        print(f"stage L={L}: loss {history[-1]:.4f}", flush=True)
    print(f"trained in {time.time() - t0:.0f}s", flush=True)

    points = []
    for spec in args.ranks.split(","):
        rk, rv = (int(v) for v in spec.split(":"))
        points.append((rk, rv))

    def run_mode(label, xkv, factor_dtype=jnp.float32):
        t = time.time()
        rec = ordered_recall(params, xkv, args.rows, args.n,
                             factor_dtype=factor_dtype)
        ndl = multi_needle(params, xkv, args.rows, args.n,
                           factor_dtype=factor_dtype)
        nll = (float("nan") if args.skip_nll else
               teacher_forced_nll(params, xkv, args.rows, args.n,
                                  factor_dtype=factor_dtype))
        print(f"{label:28s} recall={rec:.3f} needle={ndl:.3f} "
              f"nll={nll:.4f}   ({time.time() - t:.0f}s)", flush=True)
        return rec, ndl, nll

    print(f"\n== rows={args.rows}, group matrix ({args.rows}, 4096), "
          f"n={args.n} per task ==", flush=True)
    run_mode("uncompressed", None)
    for rk, rv in points:
        for mode in args.modes.split(","):
            fd = jnp.float32
            m = mode
            if mode == "post-int8":
                m, fd = "post", "int8"
            elif mode == "post-int4":
                m, fd = "post", "int4"
            run_mode(f"rank {rk}/{rv} {mode}", xkv_with(rk, rv, m),
                     factor_dtype=fd)


if __name__ == "__main__":
    main()
