"""Post-fusion top-level HBM traffic from optimized HLO text.

The repo's single utilization semantics (ROADMAP, VERDICT r3 #4): XLA's
``cost_analysis()["bytes accessed"]`` is an UPPER bound (it counts
fusion-internal reads/writes that never leave VMEM), so utilization
figures built on it disagree with the floor probes. This module walks the
optimized HLO ENTRY computation and sums, for every non-free instruction,
its output buffer bytes plus its operand buffer bytes: after fusion each
top-level instruction is one kernel launch whose operands/results live in
HBM, so this approximates the traffic the program really pays (still
over-counting operands that stay VMEM-resident across consumers, and
under-counting DMA padding).

``bench.py``, ``profile_train_step.py`` and ``scripts/probe_*floor*``
all report ``hbm_gbps`` from this measure; the cost-analysis figure is
kept only under an explicitly-labeled ``*_xla_ub`` name.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16, "token": 0,
    "s4": 1, "u4": 1,
}

# instructions that do not move data at runtime (aliases / metadata)
_FREE_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "iota",  # iota is generated on the fly inside a kernel
}

_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
    r"(\((?:[^()]|\([^)]*\))*\)|[\w\[\],]+)\s+"
    r"([\w\-]+)\((.*)$")


def shape_bytes(shape: str) -> int:
    """'f32[64,215,64]' or tuple '(f32[2], bf16[3,4])' -> buffer bytes."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def entry_traffic(hlo_text: str, top: int = 12):
    """Sum top-level operand+output bytes over the ENTRY computation.

    Returns (total_bytes, [(bytes, line) top offenders], per-op totals).
    """
    # strip layout annotations: f32[8,128]{1,0:T(8,128)(2,1)S(1)} -> f32[8,128]
    hlo_text = re.sub(r"\]\{[^}]*\}", "]", hlo_text)
    lines = hlo_text.splitlines()
    # find the ENTRY computation block
    entry_start = None
    for i, ln in enumerate(lines):
        if ln.startswith("ENTRY "):
            entry_start = i
            break
    assert entry_start is not None, "no ENTRY computation found"
    # shapes of every named value in ENTRY (for operand lookups)
    shapes: dict = {}
    body: list = []
    depth = 0
    for ln in lines[entry_start:]:
        depth += ln.count("{") - ln.count("}")
        body.append(ln)
        if depth <= 0 and len(body) > 1:
            break
    for ln in body:
        m = _INSTR_RE.match(ln)
        if m:
            shapes[m.group(1)] = m.group(2)

    total = 0
    offenders: list = []
    by_op: dict = {}
    for ln in body:
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, shape, op = m.group(1), m.group(2), m.group(3)
        if op in _FREE_OPS:
            continue
        out_b = shape_bytes(shape)
        # operands: everything up to the closing paren of the arg list
        args = m.group(4).split("), ")[0]
        opnd_b = 0
        for ref in re.findall(r"%([\w.\-]+)", args):
            if ref in shapes:
                opnd_b += shape_bytes(shapes[ref])
        instr_total = out_b + opnd_b
        total += instr_total
        by_op[op] = by_op.get(op, 0) + instr_total
        offenders.append((instr_total, f"{op:24s} out={out_b/1e6:8.1f} MB"
                          f" operands={opnd_b/1e6:8.1f} MB  {name[:60]}"))
    offenders.sort(key=lambda t: -t[0])
    return total, offenders[:top], by_op


def compiled_traffic_bytes(compiled) -> int:
    """Post-fusion top-level traffic of a ``jax.stages.Compiled``."""
    total, _, _ = entry_traffic(compiled.as_text())
    return total
