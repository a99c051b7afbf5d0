"""Tiny native checkpoint format for locally-trained models.

The reference's eval entry point loads HF checkpoints from the hub
(`evaluate/eval_acc.py` via `utils.py:50-66`); with zero egress the only
models that exist here are ones trained in-repo (the production-geometry
study model, `scripts/rope_mode_study_production.py`). This module gives
those a durable on-disk form so `cli/eval_acc.py --model ckpt:<dir>` can
drive the full RULER harness against them: params as one ``.npz`` (flat
'/'-joined pytree paths) plus the ``ModelConfig`` as json.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import jax
import numpy as np

from xkv_tpu.models.config import ModelConfig


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(jax.device_get(tree))
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [fix(node[f"#{i}"]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_checkpoint(path: str, params, cfg: ModelConfig) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "params.npz"), **_flatten(params)
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_checkpoint(path: str, dtype=None) -> Tuple[dict, ModelConfig]:
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig(**json.load(f))
    with np.load(os.path.join(path, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(flat)
    if dtype is not None:
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype)
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a),
            params,
        )
    return params, cfg
