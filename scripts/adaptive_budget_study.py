"""Dose-response study for the adaptive sparse budget (VERDICT r4 #10).

Runs the offline RULER multi-answer tasks (multiquery / multivalue — the
tasks that stay budget-limited under the mixed top-4 config) through
eval_acc with ``sparse_topk=LO, sparse_topk_max=HI`` and measures BOTH
the accuracy and the *average spent budget*: a host callback counts, per
(decode step x sparse layer), how often the hot-chunk trigger fired, so
avg_budget = LO + (HI - LO) * trigger_rate.

The claim under test: adaptive reaches the top-HI accuracy at an average
budget at or below a static mid budget — spending chunks only on the
steps whose Quest bound statistics show several competing needles.

    python scripts/adaptive_budget_study.py --datalen 8192 \
        --num-samples 24 --out results/ruler_e2e_8k_n24

Writes results/adaptive_budget_study.json and prints a markdown table.
"""

import argparse
import json
import os
import sys

import jax

# The axon tunnel does not support host callbacks (debug.callback), so the
# trigger-rate counting pass runs on CPU (--force-cpu --count): the trigger
# is a pure function of weights+data, so the rate transfers; accuracy is
# taken from the on-chip pass (run WITHOUT --count).
if os.environ.get("XKV_FORCE_CPU") or "--force-cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xkv_tpu.ops.attention as A  # noqa: E402

COUNTS = {"layer_steps": 0, "hi": 0}
_ORIG_HOT = A.adaptive_hot_chunks


def _install_counter(n_lo: int):
    def counting(sc_raw, live, band=0.5):
        hot = _ORIG_HOT(sc_raw, live, band)  # band arrives from the engine

        def rec(h):
            COUNTS["layer_steps"] += 1
            COUNTS["hi"] += int((h > n_lo).any())

        jax.debug.callback(rec, hot)
        return hot

    A.adaptive_hot_chunks = counting


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datalen", type=int, default=8192)
    ap.add_argument("--num-samples", type=int, default=24)
    ap.add_argument("--model", default="ckpt:results/production_model")
    ap.add_argument("--out", default="results/ruler_e2e_8k_n24",
                    help="RULER e2e dir whose data/ to reuse")
    ap.add_argument("--tasks", nargs="+",
                    default=["niah_multiquery", "niah_multivalue"])
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--band", type=float, default=0.5,
                    help="adaptive hot-chunk band (larger fires more)")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on CPU (handled at import; accepted here so "
                    "argparse doesn't reject it)")
    ap.add_argument("--count", action="store_true",
                    help="install the host-callback trigger counter "
                    "(CPU only — the axon tunnel rejects host callbacks)")
    args = ap.parse_args()

    from xkv_tpu.cli import eval_acc

    data_dir = os.path.join(args.out, "data")
    datasets = [f"ruler/{t}" for t in args.tasks]
    label = f"adaptive_{args.lo}to{args.hi}_b{args.band}"
    if args.count:
        _install_counter(args.lo)
    label += "_cpu" if args.force_cpu else ""
    eval_acc.main([
        "--model", args.model,
        "--datasets", *datasets,
        "--datalen", str(args.datalen),
        "--num_samples", str(args.num_samples),
        "--data_dir", data_dir,
        "--result_dir", os.path.join(args.out, label),
        "--benchmark", "ruler",
        "--pad_to", "2048",
        "--xKV", "--mode", "factored", "--rope_mode", "post",
        "--layer_group_size", "4", "--rank_k", "512", "--rank_v", "768",
        "--factor_dtype", "int8",
        "--sparse_topk", str(args.lo), "--sparse_topk_max", str(args.hi),
        "--sparse_adaptive_band", str(args.band),
        "--sparse_block", "512", "--sparse_layers", "0,1,2",
    ])

    steps = max(COUNTS["layer_steps"], 1)
    rate = COUNTS["hi"] / steps if args.count else None
    avg_budget = (args.lo + (args.hi - args.lo) * rate
                  if rate is not None else None)
    # pull the scores just written
    model_name = os.path.basename(
        os.path.normpath(args.model.split(":", 1)[-1])
    )
    res_path = os.path.join(args.out, label, "ruler", f"{model_name}.json")
    with open(res_path) as f:
        res = json.load(f)[-1]["results"]
    summary = {
        "lo": args.lo,
        "hi": args.hi,
        "band": args.band,
        "backend": jax.default_backend(),
        "layer_steps": COUNTS["layer_steps"],
        "hi_trigger_rate": round(rate, 4) if rate is not None else None,
        "avg_budget": round(avg_budget, 3) if avg_budget is not None else None,
        "scores": {d: v["score"] for d, v in res.items()},
    }
    out_path = "results/adaptive_budget_study.json"
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.append(summary)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
