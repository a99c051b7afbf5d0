"""CLI: derive an xKV layer-group config from CKA similarity.

Counterpart of the reference's `group_layers.py` (which consumes a
notebook-produced similarity matrix ``.pt``); this one can also compute the
CKA matrix directly from a model + calibration prompt.

  # from a saved similarity matrix (.npy):
  python -m xkv_tpu.cli.group_layers --similarity sim.npy --n_groups 8 \\
      --rank_k 512 --rank_v 768 --output grouped.yaml

  # end-to-end from a model (synthetic prompt):
  python -m xkv_tpu.cli.group_layers --model tiny:4x64 --n_groups 2 \\
      --rank_k 16 --rank_v 16 --output grouped.yaml
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--similarity", type=str, default=None, help=".npy matrix")
    ap.add_argument("--model", type=str, default=None)
    ap.add_argument("--calib_len", type=int, default=512)
    ap.add_argument("--which", choices=["k", "v"], default="k")
    ap.add_argument("--n_groups", type=int, required=True)
    ap.add_argument("--rank_k", type=int, default=512)
    ap.add_argument("--rank_v", type=int, default=768)
    ap.add_argument("--index_distance_scale", type=float, default=None)
    ap.add_argument("--output", type=str, required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from xkv_tpu.evalharness.cka import (
        cka_matrix,
        collect_kv_features,
        group_layers_from_cka,
        make_grouped_config,
    )

    if args.similarity:
        sim = np.load(args.similarity)
        num_layers = sim.shape[0]
    elif args.model:
        import jax
        import jax.numpy as jnp

        from xkv_tpu.cli.common import load_model_and_tokenizer

        class _A:
            model = args.model
            seed = args.seed

        params, cfg, tokenizer = load_model_and_tokenizer(_A)
        tokens = jax.random.randint(
            jax.random.PRNGKey(args.seed), (1, args.calib_len), 0, cfg.vocab_size
        )
        feats = collect_kv_features(params, cfg, tokens, which=args.which)
        sim = cka_matrix(feats)
        num_layers = cfg.num_layers
    else:
        ap.error("pass --similarity or --model")

    groups = group_layers_from_cka(
        sim, args.n_groups, index_distance_scale=args.index_distance_scale
    )
    cfg_out = make_grouped_config(groups, num_layers, args.rank_k, args.rank_v)
    cfg_out.to_yaml(args.output)
    print(f"groups: {[g.layers for g in cfg_out.layer_groups]}")
    print(f"written {args.output}")


if __name__ == "__main__":
    main()
