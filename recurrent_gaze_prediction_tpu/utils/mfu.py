"""MFU (model FLOPs utilization) accounting.

The reference logs wall-clock only (`models/gaze_rnn.py:547-563`), so
"fast" is unanchored. Here every benchmark also reports compute FLOPs per
program call — taken from XLA's own cost model on the exact compiled
program, so fusion/remat are accounted for — divided by the device's peak,
giving a roofline-anchored utilization figure (VERDICT r1 item 2).
"""

from __future__ import annotations

from typing import Optional

import jax

# Peak dense matmul throughput per chip, bf16 unless noted.
# Sources: public TPU spec sheets (cloud.google.com/tpu/docs).
PEAK_FLOPS_PER_CHIP = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5": 459e12,          # v5p
    "TPU v6 lite": 918e12,     # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s of the device, or None when unknown (e.g. CPU)."""
    device = device if device is not None else jax.devices()[0]
    return PEAK_FLOPS_PER_CHIP.get(device.device_kind)


def compiled_flops(jitted, *args, **kwargs) -> Optional[float]:
    """FLOPs per call of the compiled program, from XLA's cost analysis.

    `jitted` must be a jax.jit-wrapped callable; args are example inputs
    (shapes only matter). Returns None when the backend exposes no cost
    model.
    """
    analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(analysis, list):  # some backends: one dict per device
        analysis = analysis[0] if analysis else {}
    if not analysis:
        return None
    flops = analysis.get("flops")
    return float(flops) if flops else None


def mfu(flops_per_call: Optional[float], calls_per_sec: float,
        device: Optional[jax.Device] = None) -> Optional[float]:
    """Utilization in [0, 1]: achieved FLOP/s over device peak."""
    peak = peak_flops(device)
    if not peak or not flops_per_call:
        return None
    return flops_per_call * calls_per_sec / peak


# ----------------------------------------------------- scan-body correction
#
# XLA's cost model counts a while-loop body ONCE, so any `lax.scan` program
# (our ConvGRU/ConvLSTM recurrences, gradient-accumulation loops, and their
# backward passes) under-reports by (trip_count - 1) x body FLOPs. The
# trip count is recorded on the `while` op (`backend_config=
# {"known_trip_count":{"n":...}}`) and the body is a named computation in
# the optimized HLO, so the correction is computable from the HLO text:
# walk each while's body (recursing through fusion/call/nested-while) and
# add (n - 1) x the body's dot+convolution FLOPs. Elementwise body FLOPs
# are not re-counted — they are noise next to the contractions, and MFU is
# matmul-anchored — so the corrected figure is still a (tight) lower bound.

import re as _re

_COMP_HEADER = _re.compile(r"^(?:ENTRY )?%?([\w\.\-]+)\s*\(.*\)\s*->.*{")
_NAME_EQ = _re.compile(r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*")
_SHAPE = _re.compile(r"(?:[a-z]+\d+|pred)\[([\d,]*)\]")
_TRIP = _re.compile(r'"known_trip_count":\s*{\s*"n":\s*"(\d+)"')
_COMMENT = _re.compile(r"/\*.*?\*/")


def _shape_dims(type_str: str) -> list[list[int]]:
    """All array shapes in an HLO type string (tuples yield several)."""
    out = []
    for m in _SHAPE.finditer(type_str):
        dims = m.group(1)
        out.append([int(d) for d in dims.split(",")] if dims else [])
    return out


def _split_op_line(line: str) -> Optional[dict]:
    """Parse one HLO op line into name/type/opcode/operands/attrs.

    HLO types carry layout annotations with nested parens/braces
    (`{3,0,2,1:T(8,128)S(1)}`) and tuple types carry `/*index=N*/`
    comments, so this scans with bracket-depth counting instead of one
    regex."""
    line = _COMMENT.sub("", line)
    m = _NAME_EQ.match(line)
    if m is None:
        return None
    name = m.group(1)
    i, n = m.end(), len(line)
    start, depth = i, 0
    while i < n:
        ch = line[i]
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif ch == " " and depth == 0:
            break
        i += 1
    type_str = line[start:i]
    m2 = _re.match(r"\s*([\w\-]+)\(", line[i:])
    if m2 is None:
        return None
    opcode = m2.group(1)
    j = i + m2.end()
    depth, k = 1, j
    while k < n and depth > 0:
        if line[k] in "({[":
            depth += 1
        elif line[k] in ")}]":
            depth -= 1
        k += 1
    return {"name": name, "type": type_str, "opcode": opcode,
            "operands": line[j:k - 1], "attrs": line[k:], "line": line,
            "root": bool(_re.match(r"\s*ROOT\s", line))}


def _parse_hlo_computations(hlo_text: str) -> dict:
    """{computation_name: [op dicts]} with per-op name/type/opcode/attrs."""
    comps: dict[str, list] = {}
    current = None
    for line in hlo_text.splitlines():
        header = _COMP_HEADER.match(line)
        if header and not line.startswith(" "):
            current = header.group(1)
            comps[current] = []
            continue
        if current is None:
            continue
        if line.startswith("}"):
            current = None
            continue
        op = _split_op_line(line)
        if op:
            comps[current].append(op)
    return comps


def _ref_comp(line: str, key: str) -> Optional[str]:
    m = _re.search(key + r"=%?([\w\.\-]+)", line)
    return m.group(1) if m else None


def _operand_names(op: dict) -> list[str]:
    return _re.findall(r"%([\w\.\-]+)", op["operands"])


def _induction_init(op: dict, enclosing_ops: list, k: int) -> int:
    """Initial value of tuple element `k` of the while's init operand,
    when visible. jax's fori_loop(start, N) lowers the init as a
    `tuple(...)` whose K-th element is `constant(start)` in the while's
    ENCLOSING computation (HLO names are only unique per computation, so
    resolution must not cross computations). Returns 0 when the chain is
    not resolvable (the canonical scan case and the conservative
    default)."""
    init_names = _operand_names(op)
    if not init_names:
        return 0
    by_name = {o["name"]: o for o in enclosing_ops}
    init_op = by_name.get(init_names[0])
    if init_op is None or init_op["opcode"] != "tuple":
        return 0
    elems = _operand_names(init_op)
    if k >= len(elems):
        return 0
    elem = by_name.get(elems[k])
    if elem is not None and elem["opcode"] == "constant":
        m2 = _re.search(r"constant\((\d+)\)", elem["line"])
        if m2:
            return int(m2.group(1))
    return 0


def _induction_gte_index(name: str, ops: list) -> Optional[int]:
    """Tuple index K if op `name` is `get-tuple-element(parameter),
    index=K` in `ops` (the canonical induction-variable read)."""
    by_name = {o["name"]: o for o in ops}
    op = by_name.get(name)
    if op is None or op["opcode"] != "get-tuple-element":
        return None
    m = _re.search(r"index=(\d+)", op["attrs"])
    src = by_name.get((_operand_names(op) or [""])[0])
    if m is None or src is None or src["opcode"] != "parameter":
        return None
    return int(m.group(1))


def _induction_stride(body_ops: list, k: int) -> Optional[int]:
    """Per-iteration increment of induction tuple element `k` in the while
    body, when visible. The canonical lowering is `add(get-tuple-element
    (param, K), constant(c))`; a visible add with a NON-constant operand
    means the induction is data-dependent (return None -> no static trip
    count). When no such add is visible at all (e.g. folded into a
    fusion), assume the canonical stride 1."""
    by_name = {o["name"]: o for o in body_ops}
    for op in body_ops:
        if op["opcode"] != "add":
            continue
        operands = _operand_names(op)
        if len(operands) != 2:
            continue
        sides = [by_name.get(o) for o in operands]
        for a, b in ((sides[0], sides[1]), (sides[1], sides[0])):
            if a is None or _induction_gte_index(a["name"], body_ops) != k:
                continue
            if b is not None and b["opcode"] == "constant":
                m = _re.search(r"constant\((\d+)\)", b["line"])
                if m and int(m.group(1)) > 0:
                    return int(m.group(1))
            return None  # update of element K is visibly non-canonical
    return 1


def _while_trip_count(op: dict, comps: dict,
                      enclosing_ops: list) -> Optional[int]:
    """Trip count of a while op. CPU HLO records it as backend_config
    known_trip_count; TPU HLO does not, but jax scans/fori lower to a
    canonical induction: the condition's ROOT is `compare(
    get-tuple-element(param, K), constant(N)), direction=LT` and the body
    advances element K by a constant stride — so the trip count is
    ceil((N - init_K) / stride) (init 0 / stride 1 for scans;
    fori_loop(start, N) bakes `start` into the while's init tuple).
    Requiring the compare to be the condition ROOT rejects compound
    (data-dependent) conditions like `(i < N) & (err > eps)`, and a
    visibly non-constant induction update rejects dynamic strides.
    Returns None when the pattern doesn't match (no correction,
    conservative)."""
    trip = _TRIP.search(op["attrs"])
    if trip:
        return int(trip.group(1))
    cond = _ref_comp(op["attrs"], "condition")
    body = _ref_comp(op["attrs"], "body")
    if cond is None or body is None:
        return None
    cond_ops = comps.get(cond, [])
    root = next((c for c in cond_ops if c.get("root")), None)
    if root is None or root["opcode"] != "compare" or \
            "direction=LT" not in root["attrs"]:
        return None
    operands = _operand_names(root)
    if len(operands) != 2:
        return None
    k = _induction_gte_index(operands[0], cond_ops)
    by_name = {o["name"]: o for o in cond_ops}
    limit_op = by_name.get(operands[1])
    if k is None or limit_op is None or limit_op["opcode"] != "constant":
        return None
    m = _re.search(r"constant\((\d+)\)", limit_op["line"])
    if m is None:
        return None
    n = int(m.group(1))
    stride = _induction_stride(comps.get(body, []), k)
    if stride is None:
        return None
    start = _induction_init(op, enclosing_ops, k)
    return max(-(-(n - start) // stride), 0)


def _op_flops(op: dict, shapes: dict) -> float:
    """dot / convolution FLOPs from HLO shapes (2 * madds)."""
    out_shapes = _shape_dims(op["type"])
    if not out_shapes:
        return 0.0
    out_elems = 1.0
    for d in out_shapes[0]:
        out_elems *= d
    operands = _operand_names(op)
    if op["opcode"] == "dot":
        lhs = shapes.get(operands[0]) if operands else None
        m = _re.search(r"lhs_contracting_dims={([\d,]*)}", op["attrs"])
        if lhs is None or m is None:
            return 0.0
        k = 1.0
        for d in (int(x) for x in m.group(1).split(",") if x):
            if d < len(lhs):
                k *= lhs[d]
        return 2.0 * out_elems * k
    if op["opcode"] == "convolution":
        kernel = shapes.get(operands[1]) if len(operands) > 1 else None
        m = _re.search(r"dim_labels=[\w?]+_([\w?]+)->", op["attrs"])
        if kernel is None or m is None:
            return 0.0
        klabels = m.group(1)
        if len(klabels) != len(kernel):
            return 0.0
        k = 1.0
        for label, dim in zip(klabels, kernel):
            if label.isdigit() or label == "i":
                k *= dim
        return 2.0 * out_elems * k
    return 0.0


def _comp_flops(name: str, comps: dict, memo: dict) -> float:
    """dot+conv FLOPs of one computation, recursing through fusion/call
    bodies and weighting nested whiles by their own trip counts."""
    if name in memo:
        return memo[name]
    memo[name] = 0.0  # break cycles defensively
    ops = comps.get(name, [])
    shapes = {}
    for op in ops:
        arr = _shape_dims(op["type"])
        if len(arr) == 1:
            shapes[op["name"]] = arr[0]
    total = 0.0
    for op in ops:
        code = op["opcode"]
        if code in ("dot", "convolution"):
            total += _op_flops(op, shapes)
        elif code == "fusion":
            callee = _ref_comp(op["attrs"], "calls")
            if callee:
                total += _comp_flops(callee, comps, memo)
        elif code in ("call", "custom-call", "map", "reduce",
                      "reduce-window", "scatter", "sort", "all-reduce"):
            callee = _ref_comp(op["attrs"], "to_apply")
            if callee:
                total += _comp_flops(callee, comps, memo)
        elif code == "while":
            body = _ref_comp(op["attrs"], "body")
            n = _while_trip_count(op, comps, ops)
            if n is None:
                n = 1  # unknown trip: count the body once, like XLA does
            if body:
                total += n * _comp_flops(body, comps, memo)
    memo[name] = total
    return total


def scan_flops_undercount(hlo_text: str) -> float:
    """Total FLOPs XLA's cost model misses by counting each while body
    once: sum over whiles of (trip_count - 1) x body dot/conv FLOPs.
    Nested whiles inside a body are weighted by their own trip counts."""
    comps = _parse_hlo_computations(hlo_text)
    memo: dict = {}
    missing = 0.0
    for name, ops in comps.items():
        for op in ops:
            if op["opcode"] != "while":
                continue
            body = _ref_comp(op["attrs"], "body")
            n = _while_trip_count(op, comps, ops)
            if body is None or n is None:
                continue
            if n > 1:
                missing += (n - 1) * _comp_flops(body, comps, memo)
    return missing


def compiled_flops_corrected(jitted, *args, **kwargs
                             ) -> tuple[Optional[float], Optional[float]]:
    """(corrected, xla_costmodel) FLOPs per call: XLA's aggregate plus the
    scan-body undercount. The corrected figure is the honest numerator for
    train MFU on scan-based models (VERDICT r3 item 5); the raw cost-model
    number is kept for continuity with earlier rounds."""
    compiled = jitted.lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    reported = float(analysis.get("flops", 0.0)) or None
    if reported is None:
        return None, None
    try:
        correction = scan_flops_undercount(compiled.as_text())
    except Exception:  # HLO text unavailable/unparseable: no correction
        correction = 0.0
    return reported + correction, reported
