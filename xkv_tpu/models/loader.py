"""Load HF-format weights (local safetensors) into the functional param tree.

Replaces the reference's `load_model_and_tokenizer` (`utils.py:50-66`, which
uses transformers' from_pretrained + CUDA device_map) with a direct
safetensors -> pytree mapping for the Llama family. No network access: the
model directory must be local.

Name mapping (HF -> ours):
  model.embed_tokens.weight                    embed
  model.layers.{i}.self_attn.{q,k,v,o}_proj    layers[i].attn.w{q,k,v,o} (transposed)
  model.layers.{i}.mlp.{gate,up,down}_proj     layers[i].mlp.w_{gate,up,down} (transposed)
  model.layers.{i}.input_layernorm             layers[i].input_norm
  model.layers.{i}.post_attention_layernorm    layers[i].post_norm
  model.norm.weight                            final_norm
  lm_head.weight                               lm_head (transposed; absent if tied)
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from xkv_tpu.models.config import ModelConfig


def _open_shards(model_dir: str):
    from safetensors import safe_open

    paths = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not paths:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    handles = [safe_open(p, framework="numpy") for p in paths]
    index: Dict[str, int] = {}
    for i, h in enumerate(handles):
        for k in h.keys():
            index[k] = i
    return handles, index


def load_llama_params(model_dir: str, dtype=jnp.bfloat16):
    """Load a local HF Llama/Mistral/Qwen2 checkpoint.

    Returns (params, ModelConfig).
    """
    cfg = ModelConfig.from_pretrained(model_dir)
    handles, index = _open_shards(model_dir)

    def get(name: str) -> np.ndarray:
        t = handles[index[name]].get_tensor(name)
        if t.dtype == np.dtype("V2"):  # bfloat16 comes back as void16 in numpy
            t = t.view(np.uint16)
            return jnp.asarray(t).view(jnp.bfloat16)
        return t

    def dense(name: str):
        # HF stores (out, in); our matmuls are x @ w with w (in, out).
        return jnp.asarray(get(name), dtype).T

    def vec(name: str):
        return jnp.asarray(get(name), dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        attn = {
            "wq": dense(f"{p}.self_attn.q_proj.weight"),
            "wk": dense(f"{p}.self_attn.k_proj.weight"),
            "wv": dense(f"{p}.self_attn.v_proj.weight"),
            "wo": dense(f"{p}.self_attn.o_proj.weight"),
        }
        if cfg.attention_bias:
            attn["bq"] = vec(f"{p}.self_attn.q_proj.bias")
            attn["bk"] = vec(f"{p}.self_attn.k_proj.bias")
            attn["bv"] = vec(f"{p}.self_attn.v_proj.bias")
        layers.append(
            {
                "attn": attn,
                "mlp": {
                    "w_gate": dense(f"{p}.mlp.gate_proj.weight"),
                    "w_up": dense(f"{p}.mlp.up_proj.weight"),
                    "w_down": dense(f"{p}.mlp.down_proj.weight"),
                },
                "input_norm": vec(f"{p}.input_layernorm.weight"),
                "post_norm": vec(f"{p}.post_attention_layernorm.weight"),
            }
        )
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": vec("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense("lm_head.weight")
    return params, cfg


def save_llama_params(params, cfg: ModelConfig, model_dir: str):
    """Write params back out in HF layout (single shard) + config.json.
    Used by tests to fabricate local checkpoints."""
    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    def put_dense(name, w):
        tensors[name] = np.asarray(w, np.float32).T.copy()

    def put_vec(name, w):
        tensors[name] = np.asarray(w, np.float32)

    tensors["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        put_dense(f"{p}.self_attn.q_proj.weight", layer["attn"]["wq"])
        put_dense(f"{p}.self_attn.k_proj.weight", layer["attn"]["wk"])
        put_dense(f"{p}.self_attn.v_proj.weight", layer["attn"]["wv"])
        put_dense(f"{p}.self_attn.o_proj.weight", layer["attn"]["wo"])
        if "bq" in layer["attn"]:
            put_vec(f"{p}.self_attn.q_proj.bias", layer["attn"]["bq"])
            put_vec(f"{p}.self_attn.k_proj.bias", layer["attn"]["bk"])
            put_vec(f"{p}.self_attn.v_proj.bias", layer["attn"]["bv"])
        put_dense(f"{p}.mlp.gate_proj.weight", layer["mlp"]["w_gate"])
        put_dense(f"{p}.mlp.up_proj.weight", layer["mlp"]["w_up"])
        put_dense(f"{p}.mlp.down_proj.weight", layer["mlp"]["w_down"])
        put_vec(f"{p}.input_layernorm.weight", layer["input_norm"])
        put_vec(f"{p}.post_attention_layernorm.weight", layer["post_norm"])
    put_vec("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put_dense("lm_head.weight", params["lm_head"])

    save_file(tensors, os.path.join(model_dir, "model.safetensors"))
    hf_config = {
        "model_type": cfg.model_type,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_q_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "rope_scaling": cfg.rope_scaling,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "sliding_window": cfg.sliding_window,
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=2)


def load_deepseek_params(model_dir: str, dtype=jnp.bfloat16):
    """Load a local HF DeepSeek-V2(-Lite) checkpoint (MLA + MoE).

    Replaces the reference's trust_remote_code from_pretrained path
    (`utils.py:56-63`) for the DeepSeek family. HF name mapping:
      self_attn.q_proj | q_a_proj/q_a_layernorm/q_b_proj  (q-LoRA optional)
      self_attn.kv_a_proj_with_mqa -> attn.kv_a_proj
      self_attn.kv_a_layernorm     -> attn.kv_a_norm
      self_attn.kv_b_proj          -> attn.kv_b_proj
      mlp.gate (router), mlp.experts.{e}.*, mlp.shared_experts.*
    """
    cfg = ModelConfig.from_pretrained(model_dir)
    if cfg.model_type != "deepseek_v2":
        raise ValueError(f"not a deepseek_v2 checkpoint: {cfg.model_type}")
    handles, index = _open_shards(model_dir)

    def get(name: str) -> np.ndarray:
        t = handles[index[name]].get_tensor(name)
        if t.dtype == np.dtype("V2"):
            t = t.view(np.uint16)
            return jnp.asarray(t).view(jnp.bfloat16)
        return t

    def dense(name: str):
        return jnp.asarray(get(name), dtype).T

    def vec(name: str):
        return jnp.asarray(get(name), dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        a = f"{p}.self_attn"
        attn = {
            "kv_a_proj": dense(f"{a}.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": vec(f"{a}.kv_a_layernorm.weight"),
            "kv_b_proj": dense(f"{a}.kv_b_proj.weight"),
            "o_proj": dense(f"{a}.o_proj.weight"),
        }
        if cfg.q_lora_rank:
            attn["q_a_proj"] = dense(f"{a}.q_a_proj.weight")
            attn["q_a_norm"] = vec(f"{a}.q_a_layernorm.weight")
            attn["q_b_proj"] = dense(f"{a}.q_b_proj.weight")
        else:
            attn["q_proj"] = dense(f"{a}.q_proj.weight")

        use_moe = (
            cfg.n_routed_experts is not None and i >= cfg.first_k_dense_replace
        )
        if use_moe:
            E = cfg.n_routed_experts
            mlp = {
                "router": dense(f"{p}.mlp.gate.weight"),
                "experts": {
                    "w_gate": jnp.stack(
                        [dense(f"{p}.mlp.experts.{e}.gate_proj.weight")
                         for e in range(E)]
                    ),
                    "w_up": jnp.stack(
                        [dense(f"{p}.mlp.experts.{e}.up_proj.weight")
                         for e in range(E)]
                    ),
                    "w_down": jnp.stack(
                        [dense(f"{p}.mlp.experts.{e}.down_proj.weight")
                         for e in range(E)]
                    ),
                },
            }
            if cfg.n_shared_experts:
                mlp["shared"] = {
                    "w_gate": dense(f"{p}.mlp.shared_experts.gate_proj.weight"),
                    "w_up": dense(f"{p}.mlp.shared_experts.up_proj.weight"),
                    "w_down": dense(f"{p}.mlp.shared_experts.down_proj.weight"),
                }
        else:
            mlp = {
                "w_gate": dense(f"{p}.mlp.gate_proj.weight"),
                "w_up": dense(f"{p}.mlp.up_proj.weight"),
                "w_down": dense(f"{p}.mlp.down_proj.weight"),
            }
        layers.append(
            {
                "attn": attn,
                "mlp": mlp,
                "input_norm": vec(f"{p}.input_layernorm.weight"),
                "post_norm": vec(f"{p}.post_attention_layernorm.weight"),
            }
        )
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": vec("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense("lm_head.weight")
    return params, cfg


def save_deepseek_params(params, cfg: ModelConfig, model_dir: str):
    """Write DeepSeek params in HF layout (single shard) + config.json —
    used by tests to fabricate local checkpoints."""
    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    def put_dense(name, w):
        tensors[name] = np.asarray(w, np.float32).T.copy()

    def put_vec(name, w):
        tensors[name] = np.asarray(w, np.float32)

    tensors["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        a = f"{p}.self_attn"
        attn = layer["attn"]
        put_dense(f"{a}.kv_a_proj_with_mqa.weight", attn["kv_a_proj"])
        put_vec(f"{a}.kv_a_layernorm.weight", attn["kv_a_norm"])
        put_dense(f"{a}.kv_b_proj.weight", attn["kv_b_proj"])
        put_dense(f"{a}.o_proj.weight", attn["o_proj"])
        if "q_b_proj" in attn:
            put_dense(f"{a}.q_a_proj.weight", attn["q_a_proj"])
            put_vec(f"{a}.q_a_layernorm.weight", attn["q_a_norm"])
            put_dense(f"{a}.q_b_proj.weight", attn["q_b_proj"])
        else:
            put_dense(f"{a}.q_proj.weight", attn["q_proj"])
        mlp = layer["mlp"]
        if "router" in mlp:
            put_dense(f"{p}.mlp.gate.weight", mlp["router"])
            for e in range(mlp["experts"]["w_gate"].shape[0]):
                put_dense(f"{p}.mlp.experts.{e}.gate_proj.weight",
                          mlp["experts"]["w_gate"][e])
                put_dense(f"{p}.mlp.experts.{e}.up_proj.weight",
                          mlp["experts"]["w_up"][e])
                put_dense(f"{p}.mlp.experts.{e}.down_proj.weight",
                          mlp["experts"]["w_down"][e])
            if "shared" in mlp:
                put_dense(f"{p}.mlp.shared_experts.gate_proj.weight",
                          mlp["shared"]["w_gate"])
                put_dense(f"{p}.mlp.shared_experts.up_proj.weight",
                          mlp["shared"]["w_up"])
                put_dense(f"{p}.mlp.shared_experts.down_proj.weight",
                          mlp["shared"]["w_down"])
        else:
            put_dense(f"{p}.mlp.gate_proj.weight", mlp["w_gate"])
            put_dense(f"{p}.mlp.up_proj.weight", mlp["w_up"])
            put_dense(f"{p}.mlp.down_proj.weight", mlp["w_down"])
        put_vec(f"{p}.input_layernorm.weight", layer["input_norm"])
        put_vec(f"{p}.post_attention_layernorm.weight", layer["post_norm"])
    put_vec("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put_dense("lm_head.weight", params["lm_head"])

    save_file(tensors, os.path.join(model_dir, "model.safetensors"))
    hf_config = {
        "model_type": "deepseek_v2",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_q_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "q_lora_rank": cfg.q_lora_rank,
        "kv_lora_rank": cfg.kv_lora_rank,
        "qk_rope_head_dim": cfg.qk_rope_head_dim,
        "qk_nope_head_dim": cfg.qk_nope_head_dim,
        "v_head_dim": cfg.v_head_dim,
        "n_routed_experts": cfg.n_routed_experts,
        "n_shared_experts": cfg.n_shared_experts,
        "num_experts_per_tok": cfg.num_experts_per_tok,
        "moe_intermediate_size": cfg.moe_intermediate_size,
        "first_k_dense_replace": cfg.first_k_dense_replace,
        "routed_scaling_factor": cfg.routed_scaling_factor,
        "norm_topk_prob": cfg.norm_topk_prob,
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=2)


def load_params(model_dir: str, dtype=jnp.bfloat16):
    """Model-type-routed loader (the reference's single from_pretrained
    entry point): llama-family -> load_llama_params, deepseek_v2 ->
    load_deepseek_params."""
    cfg = ModelConfig.from_pretrained(model_dir)
    if cfg.model_type == "deepseek_v2":
        return load_deepseek_params(model_dir, dtype=dtype)
    return load_llama_params(model_dir, dtype=dtype)
