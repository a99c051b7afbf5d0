"""Profiling / tracing helpers (SURVEY §5: the reference has none beyond
per-sample GPU-memory prints, `evaluate/evaluator.py:79-80`).

  * ``trace(dir)``       — context manager around jax.profiler.trace.
  * ``phase_timer``      — wall-clock phase accounting (prefill / svd /
    decode) with a JSON summary; forces completion via device_get because
    some transports (the axon tunnel here) do not block in
    block_until_ready.
  * ``device_op_times``  — parse a saved trace into per-op device totals
    (how the kernels in this repo were tuned).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def peak_memory_bytes(device=None) -> Optional[int]:
    """Peak device-memory high-water mark in bytes, or None when the
    backend does not expose allocator stats (CPU).

    TPU-native equivalent of the reference's per-sample
    ``torch.cuda.max_memory_allocated()`` display
    (`evaluate/evaluator.py:79-80`).
    """
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    # Strictly the peak stat: falling back to bytes_in_use would report
    # *current* usage under the "peak" name (ADVICE r1).
    return stats.get("peak_bytes_in_use")


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.device_get(jax.tree_util.tree_leaves(result)[0])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mark(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def device_op_times(trace_dir: str, device_pid: Optional[int] = None) -> Dict[str, float]:
    """Aggregate device-op durations (ms) from a jax.profiler trace dir."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace files under {trace_dir}")
    data = json.load(gzip.open(paths[-1]))
    events = data.get("traceEvents", [])
    if device_pid is None:
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "TPU" in str(e.get("args", {}).get("name", "")):
                    device_pid = e["pid"]
                    break
    totals: Dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == device_pid:
            totals[e["name"]] += e.get("dur", 0) / 1e3
    return dict(sorted(totals.items(), key=lambda kv: -kv[1]))
