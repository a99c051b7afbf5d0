"""Compressor training loop: optax AdamW + cosine, MSE (+KL) reconstruction.

TPU-native rebuild of the reference's Lightning module
(`src/kv_lightning_module.py:22-519`): on-the-fly KV collection from a
frozen base model per batch, reconstruction loss, cosine-scheduled AdamW,
and **compressor-only checkpointing** (base-model weights are never saved;
reference `kv_lightning_module.py:404-469`). jit-compiled train step; the
frozen forward runs under ``lax.stop_gradient``-free no-grad semantics by
construction (params are not differentiated).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import serialization

from xkv_tpu.models.config import ModelConfig
from xkv_tpu.train.collector import collect_kv
from xkv_tpu.train.compressors import VAEConvCompressor, kl_divergence, make_compressor


@dataclass
class TrainConfig:
    compressor: str = "dual1d"
    compressor_kwargs: Dict[str, Any] = field(default_factory=dict)
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    warmup_steps: int = 10
    total_steps: int = 1000
    kl_weight: float = 1e-3
    seed: int = 0


class CompressorTrainer:
    def __init__(self, base_params, model_cfg: ModelConfig, cfg: TrainConfig):
        self.base_params = base_params
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.compressor = make_compressor(cfg.compressor, **cfg.compressor_kwargs)
        self.is_vae = isinstance(self.compressor, VAEConvCompressor)

        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        )
        self.tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)

        self.params: Optional[Dict] = None
        self.opt_state = None
        self.step = 0
        self.history = []

        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------ init
    def init(self, sample_tokens: jax.Array):
        kv = collect_kv(self.base_params, self.model_cfg, sample_tokens)
        rngs = {"params": jax.random.PRNGKey(self.cfg.seed)}
        if self.is_vae:
            rngs["reparam"] = jax.random.PRNGKey(self.cfg.seed + 1)
        variables = self.compressor.init(rngs, kv.astype(jnp.float32), train=True)
        self.params = variables["params"]
        self.opt_state = self.tx.init(self.params)
        return kv.shape

    # ----------------------------------------------------------------- steps
    def _loss(self, params, kv, rng):
        kv = kv.astype(jnp.float32)
        if self.is_vae:
            recon, mu, logvar = self.compressor.apply(
                {"params": params}, kv, train=True, rngs={"reparam": rng}
            )
            mse = jnp.mean((recon - kv) ** 2)
            kl = kl_divergence(mu, logvar)
            return mse + self.cfg.kl_weight * kl, {"mse": mse, "kl": kl}
        recon = self.compressor.apply({"params": params}, kv, train=True)
        mse = jnp.mean((recon - kv) ** 2)
        mae = jnp.mean(jnp.abs(recon - kv))
        return mse, {"mse": mse, "mae": mae}

    def _train_step_impl(self, params, opt_state, tokens, rng):
        kv = collect_kv(self.base_params, self.model_cfg, tokens)
        (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, kv, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    def _eval_step_impl(self, params, tokens, rng):
        kv = collect_kv(self.base_params, self.model_cfg, tokens)
        return self._loss(params, kv, rng)

    def train_step(self, tokens) -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.cfg.seed * 100003 + self.step)
        self.params, self.opt_state, loss, metrics = self._train_step(
            self.params, self.opt_state, jnp.asarray(tokens, jnp.int32), rng
        )
        self.step += 1
        row = {"step": self.step, "loss": float(loss)}
        row.update({k: float(v) for k, v in metrics.items()})
        if hasattr(self.compressor, "compression_ratio"):
            row["compression_ratio"] = float(self.compressor.compression_ratio())
        self.history.append(row)
        return row

    def eval_step(self, tokens) -> Dict[str, float]:
        loss, metrics = self._eval_step(
            self.params, jnp.asarray(tokens, jnp.int32), jax.random.PRNGKey(0)
        )
        return {"loss": float(loss), **{k: float(v) for k, v in metrics.items()}}

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, path: str):
        """Compressor-only: base-model weights are excluded by construction
        (reference asserts this, `tests/test_checkpoint_saving.py:15-80`)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.to_bytes(self.params)
        with open(path, "wb") as f:
            f.write(blob)
        meta = {
            "compressor": self.cfg.compressor,
            "compressor_kwargs": self.cfg.compressor_kwargs,
            "step": self.step,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load_checkpoint(cls, path: str, base_params, model_cfg: ModelConfig,
                        sample_tokens) -> "CompressorTrainer":
        """Load requires the base model supplied at load time (the checkpoint
        never contains it — reference `kv_lightning_module.py:484-519`)."""
        with open(path + ".json") as f:
            meta = json.load(f)
        cfg = TrainConfig(
            compressor=meta["compressor"],
            compressor_kwargs=meta["compressor_kwargs"],
        )
        trainer = cls(base_params, model_cfg, cfg)
        trainer.init(jnp.asarray(sample_tokens, jnp.int32))
        with open(path, "rb") as f:
            trainer.params = serialization.from_bytes(trainer.params, f.read())
        trainer.step = meta.get("step", 0)
        return trainer

    def write_metrics_csv(self, path: str):
        import csv

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not self.history:
            return
        keys = sorted({k for row in self.history for k in row})
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(self.history)
