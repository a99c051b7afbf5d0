"""GSPMD sharding rules for params, activations, and the compressed cache.

Megatron-style tensor parallelism expressed as PartitionSpecs; XLA inserts
the collectives (all-gather / reduce-scatter / psum) over ICI — the TPU
equivalent of the reference's external NCCL dependency (SURVEY.md §2.5).

Factor sharding: the rank dimension of ``us``/``vt`` is sharded on the
model axis. Attention contributions from rank shards are partial sums that
GSPMD combines with a psum *before* softmax — mathematically exact, unlike
sharding kv-heads of the stacked group matrix (which would change the SVD).
This realizes the north star's "shard the low-rank factors across the
slice" (BASELINE.json).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xkv_tpu.cache import GroupFactors, XKVCache
from xkv_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``llama.init_params`` /
    ``deepseek.init_params`` structure (key-dispatched)."""

    _ATTN = {
        # llama family: heads on the model axis, Megatron row/col split
        "wq": P(None, MODEL_AXIS), "wk": P(None, MODEL_AXIS),
        "wv": P(None, MODEL_AXIS), "wo": P(MODEL_AXIS, None),
        "bq": P(MODEL_AXIS), "bk": P(MODEL_AXIS), "bv": P(MODEL_AXIS),
        # deepseek MLA: low-rank down-projections replicated (small),
        # head-structured up-projections sharded by head
        "kv_a_proj": P(None, None), "kv_a_norm": P(None),
        "kv_b_proj": P(None, MODEL_AXIS), "o_proj": P(MODEL_AXIS, None),
        "q_proj": P(None, MODEL_AXIS),
        "q_a_proj": P(None, None), "q_a_norm": P(None),
        "q_b_proj": P(None, MODEL_AXIS),
    }

    def ffn_spec():
        return {
            "w_gate": P(None, MODEL_AXIS),
            "w_up": P(None, MODEL_AXIS),
            "w_down": P(MODEL_AXIS, None),
        }

    def mlp_spec(mlp):
        if "router" not in mlp:
            return ffn_spec()
        # MoE: experts sharded over the model axis (expert parallelism —
        # moe_expert_parallel's shard_map reads them P(model, None, None))
        spec = {
            "router": P(None, None),
            "experts": {
                "w_gate": P(MODEL_AXIS, None, None),
                "w_up": P(MODEL_AXIS, None, None),
                "w_down": P(MODEL_AXIS, None, None),
            },
        }
        if "shared" in mlp:
            spec["shared"] = ffn_spec()
        return spec

    def layer_spec(layer):
        return {
            "attn": {k: _ATTN[k] for k in layer["attn"]},
            "mlp": mlp_spec(layer["mlp"]),
            "input_norm": P(None),
            "post_norm": P(None),
        }

    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "layers": [layer_spec(l) for l in params["layers"]],
        "final_norm": P(None),
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, MODEL_AXIS)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def cache_pspecs(cache: XKVCache) -> XKVCache:
    """PartitionSpec pytree for the hybrid cache.

    * dense segments / tail: kv-heads on model axis, batch on data axis.
    * factors: rank on model axis (partial-sum attention), batch on data.
    """

    def group_spec(g: GroupFactors) -> GroupFactors:
        return GroupFactors(
            k_us=None if g.k_us is None else P(DATA_AXIS, None, MODEL_AXIS),
            k_vt=None if g.k_vt is None else P(DATA_AXIS, MODEL_AXIS, None),
            v_us=None if g.v_us is None else P(DATA_AXIS, None, MODEL_AXIS),
            v_vt=None if g.v_vt is None else P(DATA_AXIS, MODEL_AXIS, None),
            # int8 scales are one row per batch; replicate columns.
            k_scale=None if g.k_scale is None else P(DATA_AXIS, None, None),
            v_scale=None if g.v_scale is None else P(DATA_AXIS, None, None),
            # Quest bounds are tiny (nc rows); replicate columns.
            k_cmin=None if g.k_cmin is None else P(DATA_AXIS, None, None),
            k_cmax=None if g.k_cmax is None else P(DATA_AXIS, None, None),
        )

    return XKVCache(
        groups=tuple(group_spec(g) for g in cache.groups),
        dense_k={l: P(DATA_AXIS, MODEL_AXIS, None, None) for l in cache.dense_k},
        dense_v={l: P(DATA_AXIS, MODEL_AXIS, None, None) for l in cache.dense_v},
        tail_k=P(None, DATA_AXIS, MODEL_AXIS, None, None),
        tail_v=P(None, DATA_AXIS, MODEL_AXIS, None, None),
        tail_len=P(),
    )


def token_pspec() -> P:
    return P(DATA_AXIS, None)
