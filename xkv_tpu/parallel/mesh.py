"""Device mesh construction.

Axes:
  data  — data parallelism: batch / eval-sample sharding. Maps 1:1 onto the
          reference's torchrun rank-sharded eval (`evaluate/eval_acc.py:57-77`,
          `evaluate/data/dataset.py:163-173`), but via GSPMD instead of NCCL.
  model — tensor parallelism: attention heads / MLP features / factor rank.

The reference has no TP/PP/SP (SURVEY.md §2.5); the TPU build adds TP for
the pod-slice target where one chip can't hold the model + 64K cache.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])
