"""Real multi-process eval reduce: 2 CPU ``jax.distributed`` processes run
init_distributed -> Evaluator.test (rank-sharded dataset) -> summarize with
the actual ``allgather_obj``/``barrier`` collectives (VERDICT r2 #7).

The single-process suite only ever exercises the early-return branches of
``parallel/distributed.py``; this spawns a genuine 2-process group (the
reference runs its gather under real torchrun, `evaluator.py:106-144`).
"""

import json
import os
import socket
import subprocess
import sys

WORKER = r"""
import json, os, sys

import jax

# The axon shim force-sets jax_platforms at interpreter start; override to
# CPU before any backend (incl. the distributed client) initializes.
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
coord = sys.argv[2]
out_dir = sys.argv[3]

from xkv_tpu.parallel.distributed import (
    allgather_obj, barrier, init_distributed,
)

dist = init_distributed(coordinator_address=coord, num_processes=2,
                        process_id=pid)
assert dist.world_size == 2, dist
assert dist.rank == pid, dist

import numpy as np

from xkv_tpu.evalharness.evaluator import Evaluator


class TinyDataset:
    # 5 samples; prediction == ground truth => needle_score 1.0.
    # Rank-distinguishable via sample counts (rank0: 2, rank1: 3).
    def __init__(self):
        from xkv_tpu.evalharness import metrics as M

        self.dataset_name = "tiny"
        self.items = [(np.asarray([[i]], np.int32), [f"ans{i}"])
                      for i in range(5)]
        self.gen_len = 4
        self.metric = M.needle_score
        self.classes = None
        self.is_sharded = False

    def shard(self, rank, world):
        n = len(self.items) // world
        start = rank * n
        end = start + n if rank != world - 1 else len(self.items)
        self.items = self.items[start:end]
        self.is_sharded = True

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


answers = {i: f"ans{i}" for i in range(5)}
ds = TinyDataset()
ev = Evaluator(
    generate_fn=lambda p, g: np.frombuffer(
        answers[int(p[0, 0])].encode(), np.uint8).astype(np.int32) + 3,
    decode_fn=lambda t: bytes((np.asarray(t) - 3).astype(np.uint8)).decode(),
    rank=dist.rank, world_size=dist.world_size,
)
barrier("start")
summary = ev.test(ds, output_path=os.path.join(out_dir, f"r{pid}.jsonl"),
                  verbose=False)
barrier("tested")
final = ev.summarize()  # rank0 gathers via allgather_obj; rank1 gets {}
with open(os.path.join(out_dir, f"final{pid}.json"), "w") as f:
    json.dump({"summary": summary, "final": final}, f)
# exercise the raw allgather once more with distinct per-rank payloads
gathered = allgather_obj({"rank": dist.rank, "n": len(ds)})
assert [g["rank"] for g in gathered] == [0, 1], gathered
assert sum(g["n"] for g in gathered) == 5, gathered
print("WORKER_OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_eval_reduce(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    # a fresh interpreter must not inherit this process's XLA device-count
    # flags pinning (harmless either way, but keep the env minimal)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out

    final0 = json.loads((tmp_path / "final0.json").read_text())
    final1 = json.loads((tmp_path / "final1.json").read_text())
    # rank0 holds the cross-rank weighted mean (2 + 3 samples, all correct)
    assert final0["final"]["tiny"]["n_samples"] == 5
    assert final0["final"]["tiny"]["score"] == 1.0
    # non-main ranks return {} from summarize (reference rank-0 gather)
    assert final1["final"] == {}
    # per-rank shard sizes 2 / 3 (last rank takes the remainder)
    assert final0["summary"]["n_samples"] == 2
    assert final1["summary"]["n_samples"] == 3
    # prediction jsonl streamed per rank
    assert len((tmp_path / "r0.jsonl").read_text().splitlines()) == 2
    assert len((tmp_path / "r1.jsonl").read_text().splitlines()) == 3
