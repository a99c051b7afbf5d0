"""Collective/compute overlap analysis of compiled XLA modules.

North-star requirement (BASELINE.json): "prefill SVD factorization overlaps
with ICI all-gathers of U/V factors". On TPU, overlap is produced by XLA's
latency-hiding scheduler: a collective can hide under compute exactly when
the two are NOT data-dependent. This module checks that property directly
on the optimized HLO — for every collective instruction it computes the set
of matmul/fusion instructions with no dependency path to or from it (the
scheduler's legal overlap window) and reports the fraction.

Two layers of evidence:
  * ``collective_overlap_report``: dataflow independence (backend-agnostic
    — the CPU dryrun mesh compiles the same GSPMD partitioning, so the
    independence structure matches the TPU module even though XLA:CPU
    displays collectives in their sync form);
  * async start/done pair detection (``async_pairs``): non-zero on backends
    that lower to asynchronous collectives (TPU), where the schedule itself
    places compute between start and done.

Used by the multichip dryrun (__graft_entry__.py) and pinned by
tests/test_sharding.py.
"""

from __future__ import annotations

import re
from collections import defaultdict, deque
from typing import Dict, List

COLLECTIVE_OPS = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)
COMPUTE_OPS = ("fusion", "dot", "convolution", "custom-call")

_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def _parse_entry(hlo_text: str):
    """(name -> op, name -> operand names) for the ENTRY computation."""
    lines = hlo_text.splitlines()
    entry_start = None
    for i, ln in enumerate(lines):
        if ln.startswith("ENTRY "):
            entry_start = i
            break
    if entry_start is None:
        return {}, {}
    ops: Dict[str, str] = {}
    deps: Dict[str, List[str]] = {}
    depth = 0
    for ln in lines[entry_start:]:
        depth += ln.count("{") - ln.count("}")
        m = _INSTR_RE.match(ln)
        if m:
            name, op = m.group(1), m.group(2)
            ops[name] = op
            # operands: %refs inside the first (...) argument list
            paren = ln.find("(", m.end() - len(op))
            operand_str = ln[paren:] if paren >= 0 else ""
            # cut metadata like calls=..., to_apply=... (their %refs are
            # computations, not data deps) — keep it simple: take refs
            # before the first "calls=" / "to_apply="
            for cut in ("calls=", "to_apply=", "metadata="):
                at = operand_str.find(cut)
                if at >= 0:
                    operand_str = operand_str[:at]
            deps[name] = [r for r in _OPERAND_RE.findall(operand_str)
                          if r != name]
        if depth <= 0 and entry_start and ln.strip() == "}":
            break
    return ops, deps


def _reachable(start: str, adj: Dict[str, List[str]]) -> set:
    seen = {start}
    q = deque([start])
    while q:
        n = q.popleft()
        for m in adj.get(n, ()):
            if m not in seen:
                seen.add(m)
                q.append(m)
    return seen


def collective_overlap_report(hlo_text: str) -> dict:
    """Analyze an optimized HLO module's entry computation.

    Returns {collectives, compute, async_pairs, per_collective:
    [{name, op, independent_compute, frac}], min_frac, mean_frac}.
    ``frac`` is the fraction of compute instructions with NO dependency
    path to or from that collective — the scheduler's legal overlap set.
    """
    ops, deps = _parse_entry(hlo_text)
    users = defaultdict(list)
    for name, ds in deps.items():
        for d in ds:
            users[d].append(name)

    compute = [n for n, op in ops.items()
               if any(op.startswith(c) for c in COMPUTE_OPS)]
    # On async-lowering backends (TPU) each collective appears as a
    # <op>-start / <op>-done pair; count the pair ONCE via its -start half
    # (the -done op's dependency closure differs, and double-counting skews
    # min_frac/mean_frac — ADVICE r4). Sync-form collectives (CPU) have no
    # suffix and pass through unchanged.
    colls = [n for n, op in ops.items()
             if any(op.startswith(c) for c in COLLECTIVE_OPS)
             and not op.endswith("-done")]
    # async pairs appear as <op>-start / <op>-done instruction names
    async_pairs = sum(
        1 for n, op in ops.items()
        if op.endswith("-start")
        and any(op.startswith(c) for c in COLLECTIVE_OPS)
    )

    per = []
    for c in colls:
        anc = _reachable(c, deps)  # c's ancestors (its inputs' closure)
        desc = _reachable(c, users)  # everything depending on c
        blocked = anc | desc
        indep = [n for n in compute if n not in blocked]
        per.append({
            "name": c,
            "op": ops[c],
            "independent_compute": len(indep),
            "frac": len(indep) / max(len(compute), 1),
        })
    fracs = [p["frac"] for p in per]
    return {
        "collectives": len(colls),
        "compute": len(compute),
        "async_pairs": async_pairs,
        "per_collective": per,
        "min_frac": min(fracs) if fracs else 0.0,
        "mean_frac": sum(fracs) / len(fracs) if fracs else 0.0,
    }
