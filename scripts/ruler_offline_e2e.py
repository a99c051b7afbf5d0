"""Full offline RULER suite, end-to-end, on-chip (VERDICT r3 #2).

Drives the reference's main entry-point call stack (SURVEY §3.1,
`evaluate/eval_acc.py:92-165`) with everything produced offline:

  1. generate ALL synthetic RULER tasks at 64K byte-tokens with the real
     generator pipeline (evalharness/ruler/generate.py equivalent) into
     the Dataset's expected jsonl layout;
  2. run `cli/eval_acc.py` (generator -> jsonl -> Dataset -> Evaluator ->
     summarize -> results json) against the production-geometry trained
     model (scripts/train_production_model.py, ckpt:results/production_model)
     for each config: uncompressed baseline, xKV-4 pre (512/768, the
     reference's 8x point, README.md:87-88), and the round-3 accuracy-
     recovery point post+rank-bump (768/1024, int8);
  3. plot the niah heatmap (evalharness/viz.py) from the prediction jsonl.

Artifacts land under results/ruler_e2e/ and are summarized in
docs/RULER_OFFLINE.md.

Run on the real TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/ruler_offline_e2e.py
"""

import argparse
import json
import os
import sys
import time

import jax

# The axon TPU shim force-sets jax_platforms at interpreter start, so
# JAX_PLATFORMS=cpu alone does not keep CPU-side runs off the tunneled
# chip (tests/conftest.py has the same workaround).
if os.environ.get("XKV_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from xkv_tpu.evalharness.ruler.generators import generate_task, write_jsonl  # noqa: E402
from xkv_tpu.evalharness.ruler.tasks import SYNTHETIC_TASKS  # noqa: E402
from xkv_tpu.utils.tokenizer import ByteTokenizer  # noqa: E402

CONFIGS = {
    # label -> extra eval_acc argv (the model/data args are shared)
    "baseline": ["--mode", "none"],
    "xkv4_pre": ["--xKV", "--mode", "factored", "--rope_mode", "pre",
                 "--layer_group_size", "4", "--rank_k", "512",
                 "--rank_v", "768", "--factor_dtype", "fp32"],
    "xkv4_post_rankbump_int8": ["--xKV", "--mode", "factored",
                                "--rope_mode", "post",
                                "--layer_group_size", "4", "--rank_k", "768",
                                "--rank_v", "1024", "--factor_dtype", "int8"],
    # approximate sparse decode (Quest top-k over the factored cache):
    # 4 of 16 chunks at 8K — the serving configuration whose accuracy
    # previously rested on the synthetic induction gate alone
    "xkv4_post_sparse_int8": ["--xKV", "--mode", "factored",
                              "--rope_mode", "post",
                              "--layer_group_size", "4", "--rank_k", "512",
                              "--rank_v", "768", "--factor_dtype", "int8",
                              "--sparse_topk", "4", "--sparse_block", "512"],
    "xkv4_post_sparse8_int8": ["--xKV", "--mode", "factored",
                               "--rope_mode", "post",
                               "--layer_group_size", "4", "--rank_k", "512",
                               "--rank_v", "768", "--factor_dtype", "int8",
                               "--sparse_topk", "8", "--sparse_block", "512"],
    # per-layer sparse/dense mixing (the round-4 fix): the retrieval
    # layer (3, found by force-include bisection) reads exactly, layers
    # 0-2 stay sparse — docs/RULER_OFFLINE.md
    "xkv4_post_sparse_mixed_int8": ["--xKV", "--mode", "factored",
                                    "--rope_mode", "post",
                                    "--layer_group_size", "4",
                                    "--rank_k", "512", "--rank_v", "768",
                                    "--factor_dtype", "int8",
                                    "--sparse_topk", "4",
                                    "--sparse_block", "512",
                                    "--sparse_layers", "0,1,2"],
    # mixed at double budget — resolves the multi-answer (multiquery /
    # multivalue) budget limitation beyond one-sample noise (VERDICT r4
    # #7: n>=24 at 8K)
    "xkv4_post_sparse_mixed8_int8": ["--xKV", "--mode", "factored",
                                     "--rope_mode", "post",
                                     "--layer_group_size", "4",
                                     "--rank_k", "512", "--rank_v", "768",
                                     "--factor_dtype", "int8",
                                     "--sparse_topk", "8",
                                     "--sparse_block", "512",
                                     "--sparse_layers", "0,1,2"],
}


def gen_data(data_dir: str, datalen: int, num_samples: int, tasks):
    tok = ByteTokenizer()
    family = "base"  # tokenizer_family("byte-tokenizer") -> "base"
    for task in tasks:
        path = os.path.join(
            data_dir, family, str(datalen), task, "validation.jsonl"
        )
        if os.path.exists(path):
            print(f"{task}: exists, skipping", flush=True)
            continue
        t0 = time.time()
        rows = generate_task(
            task, tokenizer=tok, max_seq_length=datalen,
            num_samples=num_samples, random_seed=42,
        )
        write_jsonl(rows, path)
        print(f"{task}: {len(rows)} samples -> {path} "
              f"({time.time() - t0:.0f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datalen", type=int, default=65536)
    ap.add_argument("--num-samples", type=int, default=4)
    ap.add_argument("--model", default="ckpt:results/production_model")
    ap.add_argument("--out", default="results/ruler_e2e")
    ap.add_argument("--tasks", nargs="+", default=sorted(SYNTHETIC_TASKS))
    ap.add_argument("--configs", nargs="+", default=list(CONFIGS))
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()

    data_dir = os.path.join(args.out, "data")
    gen_data(data_dir, args.datalen, args.num_samples, args.tasks)
    if args.gen_only:
        return

    from xkv_tpu.cli import eval_acc

    datasets = [f"ruler/{t}" for t in args.tasks]
    for label in args.configs:
        extra = CONFIGS[label]
        t0 = time.time()
        argv = [
            "--model", args.model,
            "--datasets", *datasets,
            "--datalen", str(args.datalen),
            "--num_samples", str(args.num_samples),
            "--data_dir", data_dir,
            "--result_dir", os.path.join(args.out, label),
            "--benchmark", "ruler",
            # distinct prompt lengths are distinct XLA compiles; bucket to
            # 2048 so each (task, config) pair compiles prefill once
            "--pad_to", "2048",
        ] + extra
        print(f"\n== config {label}: eval_acc {' '.join(extra)} ==",
              flush=True)
        eval_acc.main(argv)
        print(f"config {label} done in {time.time() - t0:.0f}s", flush=True)

    # niah heatmap: join per-sample predictions with the data jsonl (the
    # needle depth is recovered by locating the gold value in the input
    # text; viz.plot_needle_viz wants score/depth_pct/ctx_len records).
    try:
        from xkv_tpu.evalharness.viz import plot_needle_viz

        model_name = os.path.basename(
            os.path.normpath(args.model.split(":", 1)[-1])
        )
        for label in args.configs:
            pred_dir = os.path.join(args.out, label, "ruler", model_name)
            if not os.path.isdir(pred_dir):
                continue
            recs = []
            for f in sorted(os.listdir(pred_dir)):
                if not (f.startswith("ruler_niah") and f.endswith(".jsonl")):
                    continue
                task = f[len("ruler_"):].rsplit("_rank", 1)[0]
                data_path = os.path.join(
                    data_dir, "base", str(args.datalen), task,
                    "validation.jsonl",
                )
                with open(data_path) as fh:
                    data = [json.loads(ln) for ln in fh if ln.strip()]
                with open(os.path.join(pred_dir, f)) as fh:
                    for ln in fh:
                        if not ln.strip():
                            continue
                        p = json.loads(ln)
                        d = data[p["index"]]
                        gold = str(p["ground_truth"][0])
                        at = d["input"].find(gold)
                        recs.append({
                            "score": p["score"],
                            "depth_pct": 100.0 * max(at, 0) / len(d["input"]),
                            "ctx_len": p["prompt_len"],
                        })
            if not recs:
                continue
            png = os.path.join(args.out, f"niah_heatmap_{label}.png")
            plot_needle_viz(recs, png, title=f"NIAH (byte RULER) — {label}")
            print(f"heatmap -> {png}", flush=True)
    except Exception as e:
        print(f"heatmap skipped: {e}", flush=True)


if __name__ == "__main__":
    main()
