"""Minimal LM training for the functional models (tests / demos).

No counterpart in the reference (it only trains compressors); used here to
produce small models with real capabilities offline — e.g. associative
recall — so the accuracy impact of KV compression can be *measured* without
downloading checkpoints (tests/test_accuracy_gate.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from xkv_tpu.models import llama
from xkv_tpu.models.config import ModelConfig


def lm_loss(params, cfg: ModelConfig, tokens: jax.Array, loss_mask: jax.Array):
    """Next-token cross-entropy. tokens (b, s); loss_mask (b, s) weights the
    *target* positions (token at i predicts i+1)."""
    logits, _ = llama.prefill(params, cfg, tokens[:, :-1])
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def train_lm(
    params,
    cfg: ModelConfig,
    batch_fn: Callable[[int], Tuple[jax.Array, jax.Array]],
    steps: int = 1000,
    lr: float = 3e-3,
    log_every: int = 200,
    verbose: bool = False,
) -> Tuple[Dict, list]:
    """AdamW + cosine training loop. batch_fn(step) -> (tokens, loss_mask)."""
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, lr, min(50, steps // 10 + 1), steps)
    )
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(lm_loss)(params, cfg, tokens, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for i in range(steps):
        tokens, mask = batch_fn(i)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(tokens), jnp.asarray(mask)
        )
        if (i + 1) % log_every == 0 or i == 0:
            history.append(float(loss))
            if verbose:
                print(f"step {i + 1}: loss {float(loss):.4f}", flush=True)
    return params, history
