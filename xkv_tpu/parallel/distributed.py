"""Multi-host runtime glue: jax.distributed init + DP eval coordination.

TPU-native replacement for the reference's torchrun/NCCL bootstrap
(`evaluate/eval_acc.py:49-77`: env-derived rank/world_size, NCCL process
group with a 90-minute timeout, barrier + gather_object). Here:

  * ``init_distributed()`` — initialize jax.distributed from env
    (JAX coordination vars or explicit args); no-op single-process.
  * ``DistConfig`` — rank/world_size/local device info (the reference's
    ``DistConfig`` analog).
  * ``barrier()`` / ``allgather_obj()`` — collectives over ICI/DCN via
    ``multihost_utils`` (the gather the Evaluator's summarize uses).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import numpy as np


@dataclass
class DistConfig:
    rank: int
    world_size: int
    local_devices: int
    coordinator: Optional[str] = None

    @property
    def is_main(self) -> bool:
        return self.rank == 0


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistConfig:
    """Initialize the multi-process runtime.

    With no arguments, reads JAX's standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata when running on Cloud TPU). Single-process when
    nothing is configured.
    """
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    proc_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    )
    if coordinator and n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n_proc,
            process_id=proc_id,
        )
    return DistConfig(
        rank=jax.process_index(),
        world_size=jax.process_count(),
        local_devices=jax.local_device_count(),
        coordinator=coordinator,
    )


def barrier(name: str = "barrier"):
    """Cross-process barrier (reference `evaluator.py:55,106`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def allgather_obj(obj: Any, max_bytes: int = 1 << 20) -> List[Any]:
    """All-gather a JSON-serializable object from every process
    (reference's ``dist.gather_object``, `evaluator.py:115`)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = json.dumps(obj).encode()
    if len(blob) > max_bytes:
        raise ValueError(f"object too large: {len(blob)} > {max_bytes}")
    buf = np.zeros(max_bytes, np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in np.asarray(gathered).reshape(jax.process_count(), max_bytes):
        raw = bytes(row.tobytes()).rstrip(b"\x00")
        out.append(json.loads(raw.decode()))
    return out
