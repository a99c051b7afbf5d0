"""Compressed-cache persistence: save/load prompt caches to disk.

The compressed factors are ~an order of magnitude smaller than dense KV,
which makes persisting prefilled prompt state practical — a session with a
64K document costs ~hundreds of MB on disk instead of multiple GB, and a
later process can resume decoding without re-prefilling (no reference
counterpart; its cache is in-process only).

Format: one ``.npz`` with flattened pytree leaves + a JSON sidecar holding
the tree structure and bookkeeping.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xkv_tpu.cache import XKVCache

_FORMAT_VERSION = 1


def save_cache(cache: XKVCache, path: str, metadata: dict = None):
    """Write a cache to ``path`` (.npz) + ``path + '.json'`` sidecar."""
    leaves, treedef = jax.tree_util.tree_flatten(cache)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)
    sidecar = {
        "format_version": _FORMAT_VERSION,
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "dtypes": [str(np.asarray(l).dtype) for l in leaves],
        "metadata": metadata or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)


def load_cache(path: str, like: XKVCache) -> Tuple[XKVCache, dict]:
    """Load a cache saved by ``save_cache``.

    ``like`` provides the tree structure (e.g. a freshly-prefilled cache of
    the same engine/config — typically from a 1-token dummy prefill, or the
    cache object whose state is being restored). Shapes and dtypes are
    validated leaf-by-leaf against the stored arrays.
    """
    with open(path + ".json") as f:
        sidecar = json.load(f)
    if sidecar["format_version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported cache format {sidecar['format_version']}")
    data = np.load(path if path.endswith(".npz") else path + ".npz")

    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves) != sidecar["num_leaves"]:
        raise ValueError(
            f"cache structure mismatch: {len(leaves)} leaves vs stored "
            f"{sidecar['num_leaves']} (different xkv config / model?)"
        )
    loaded = []
    for i, ref_leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(ref_leaf.shape):
            raise ValueError(
                f"leaf {i} shape mismatch: stored {arr.shape} vs expected "
                f"{tuple(ref_leaf.shape)}"
            )
        loaded.append(jnp.asarray(arr, dtype=ref_leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, loaded), sidecar["metadata"]
