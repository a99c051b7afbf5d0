"""Collect the offline RULER e2e results into one markdown table.

Reads {out}/{config}/ruler/{model}.json (the eval_acc aggregated format:
list of {timestamp, args, results:[{dataset, score, n_samples}...]}) for
each config and prints a dataset x config score table (latest entry per
config wins), for docs/RULER_OFFLINE.md.
"""

import argparse
import json
import os


def load(out, config, model):
    path = os.path.join(out, config, "ruler", f"{model}.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        entries = json.load(f)
    if not entries:
        return {}
    res = entries[-1]["results"] or {}
    # summarize() emits {dataset: {score, n_samples}}
    return {d: (v["score"], v["n_samples"]) for d, v in res.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/ruler_e2e")
    ap.add_argument("--model", default="production_model")
    ap.add_argument("--configs", nargs="+",
                    default=["baseline", "xkv4_pre",
                             "xkv4_post_rankbump_int8"])
    args = ap.parse_args()

    cols = {c: load(args.out, c, args.model) for c in args.configs}
    datasets = sorted({d for col in cols.values() for d in col})
    header = "| task | " + " | ".join(args.configs) + " |"
    print(header)
    print("|---" * (len(args.configs) + 1) + "|")
    for d in datasets:
        cells = []
        for c in args.configs:
            v = cols[c].get(d)
            cells.append(f"{v[0]:.3f}" if v else "—")
        print(f"| {d.split('/')[-1]} | " + " | ".join(cells) + " |")
    # weighted means
    means = []
    for c in args.configs:
        tot = sum(s * n for s, n in cols[c].values())
        n = sum(n for _, n in cols[c].values())
        means.append(f"{tot / max(n, 1):.3f}")
    print("| **mean** | " + " | ".join(f"**{m}**" for m in means) + " |")


if __name__ == "__main__":
    main()
