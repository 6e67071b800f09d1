"""Collective byte accounting over post-SPMD HLO text.

Parses the compiled (sharded) train step's HLO for collective instructions,
sums their output byte volumes, and predicts per-step communication time and
multi-chip scaling efficiency under a ring/torus algorithm model. This is how
the framework quantifies "scale comes from the mesh" without multi-chip
hardware: the partitioned HLO — identical to what real chips would execute —
is produced on a virtual CPU mesh and the ICI cost model is folded in
analytically (PERF.md "Predicted multi-chip scaling").

Cost model:
* all-reduce on an N-chip ring moves ``2*(N-1)/N * bytes`` per chip;
  reduce-scatter / all-gather move ``(N-1)/N * bytes`` each.
* collective-permute (conv halo slabs) moves its full buffer once over one
  ICI hop.
* v5e ICI: 4 links/chip x 400 Gbps/link/direction (public spec). A ring
  all-reduce streams 1 link in + 1 link out concurrently; the default
  effective per-direction bandwidth is 45 GB/s with a documented pessimistic
  band down to 25 GB/s (protocol + fragmentation overheads).
"""
from __future__ import annotations

import re
from typing import Dict

EFFECTIVE_ICI_GBPS = 45.0  # per-direction effective, v5e (band: 25-90)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

# Output-shape definitions: `%name = TYPE[dims]{layout} op-name(...)`;
# tuple-shaped outputs: `%name = (TYPE[..], TYPE[..]) op-name(...)`.
# Every collective's async `-start` form is matched (longer names first so
# they don't fall through to the base name mid-token); `-done` ops carry no
# new traffic and are excluded.
_DEF_RE = re.compile(
    r"=\s*(\(?[^=]*?\)?)\s+(all-reduce-start|all-reduce|"
    r"reduce-scatter-start|reduce-scatter|"
    r"all-gather-start|all-gather|collective-permute-start|"
    r"collective-permute|all-to-all-start|all-to-all)\(")
# Subgroup size from the instruction's replica_groups attribute — both print
# forms: explicit `{{0,1,2,3},{4,5,6,7}}` (size = first group's length) and
# iota `[num_groups,group_size]<=[...]`.
_GROUPS_EXPLICIT_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[\d+,(\d+)\]<=")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# XLA prints `/*index=N*/` markers inside long tuple shapes and operand
# lists; the `=` inside them breaks the non-greedy shape capture (this
# silently dropped the 108-operand combined gradient all-reduce when the
# parser lived in tools/collective_bytes.py) — strip them first.
_COMMENT_RE = re.compile(r"/\*.*?\*/")


def shape_bytes(text: str) -> int:
    """Total bytes of every typed shape literal in ``text``."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str) -> int:
    """Participant count of the instruction's replica subgroup (0: unknown)."""
    m = _GROUPS_EXPLICIT_RE.search(line)
    if m:
        return m.group(1).count(",") + 1
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(1))
    return 0


def collective_byte_stats(hlo: str) -> Dict[str, Dict[str, object]]:
    """Per-collective-op ``{"count", "bytes", "sizes", "groups"}`` over the
    HLO text.

    ``bytes`` sums each instruction's full output shape (tuple outputs sum
    their elements); ``sizes`` lists the per-instruction byte sizes so tests
    can bound the largest single transfer (halo slabs must stay
    O(shard surface), never O(volume)); ``groups`` lists each instruction's
    replica-subgroup size (0 when the attribute is absent) — on a mixed
    DP×SP mesh a norm-stats all-reduce spans only the 4-chip space axis and
    must be costed at (4-1)/4, not (8-1)/8.
    """
    out: Dict[str, Dict[str, object]] = {}
    for line in _COMMENT_RE.sub("", hlo).splitlines():
        m = _DEF_RE.search(line)
        if m is None:
            continue
        shapes, op = m.group(1), m.group(2)
        if op.endswith("-start"):
            op = op[: -len("-start")]
        entry = out.setdefault(op, {"count": 0, "bytes": 0, "sizes": [],
                                    "groups": []})
        b = shape_bytes(shapes)
        entry["count"] += 1
        entry["bytes"] += b
        entry["sizes"].append(b)
        entry["groups"].append(_group_size(line))
    return out


def wire_bytes_per_chip(stats: Dict[str, Dict[str, object]], n_chips: int) -> float:
    """Per-chip wire traffic under the ring/torus algorithm model, using each
    instruction's own replica-subgroup size (falling back to ``n_chips``)."""
    total = 0.0
    for op, e in stats.items():
        groups = e.get("groups") or [0] * len(e["sizes"])
        for b, g in zip(e["sizes"], groups):
            g = g or n_chips
            ratio = (g - 1) / g
            if op == "all-reduce":
                total += 2 * ratio * b
            elif op in ("reduce-scatter", "all-gather"):
                total += ratio * b
            else:  # collective-permute / all-to-all: one hop, full buffer
                total += b
    return total


def predict_scaling(stats: Dict[str, Dict[str, object]], n_chips: int,
                    single_chip_step_ms: float, space: int = 1,
                    ici_gbps: float = EFFECTIVE_ICI_GBPS) -> Dict[str, float]:
    """Fold ICI bandwidth into the byte stats: comm time + efficiency band.

    ``space`` divides the per-chip volume (and roughly the compute); pure DP
    keeps the single-chip step as the per-chip compute. ``no_overlap`` is the
    pessimistic serialization bound; ``full_overlap`` assumes perfect
    compute/comm overlap (XLA's async collectives + latency hiding).
    """
    wire = wire_bytes_per_chip(stats, n_chips)
    comm_ms = wire / (ici_gbps * 1e9) * 1e3
    compute_ms = single_chip_step_ms / space
    return {
        "wire_bytes_per_chip": wire,
        "comm_ms": comm_ms,
        "compute_ms_per_chip": compute_ms,
        "efficiency_no_overlap": compute_ms / (compute_ms + comm_ms),
        "efficiency_full_overlap": min(1.0, compute_ms / max(compute_ms, comm_ms)),
    }
