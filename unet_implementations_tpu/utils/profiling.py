"""Per-fusion cost analysis parsed from compiled (optimized) HLO.

The tunneled TPU runtime hangs ``jax.profiler`` traces (docs/PERFORMANCE.md
"Negative results"), so runtime per-op profiles are unobtainable here. This
module recovers the obtainable equivalent — static per-instruction cost
attribution of the exact program the chip executes:

- ``cost_table(fn, *args)``      lower+compile, parse the optimized HLO, and
  return one row per entry-computation instruction with analytic FLOPs
  (useful and MXU-lane-padded), HBM bytes touched, and a roofline time
  estimate at the chip ceilings measured in docs/PERFORMANCE.md.
- ``format_table(rows)``         human-readable table, biggest cost first.
- ``diff_tables(a, b)``          compare two compiles of the same program
  (e.g. batch 128 vs 192) grouped by source ``op_name`` — surfaces layout
  cliffs where XLA lowered the same source op to different-cost code.

The numbers are analytic (schedule- and overlap-blind): they bound each op
from below and attribute the graph, they do not replace a trace. Chained
wall-clock ablations (``scratch/ablate*.py``) remain the ground truth for
end-to-end time; this table explains *where* the FLOPs and bytes live.

The reference suite has no profiler at all (SURVEY §5.1 — wall-clock prints,
``Our_UNet/src/train.py:617-678``); this is its TPU-native upgrade.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

__all__ = [
    "cost_table",
    "cost_table_from_text",
    "format_table",
    "diff_tables",
    "format_diff",
    "summarize",
]

# Measured on the v5e chip used for all benchmarks (docs/PERFORMANCE.md,
# re-baselined round 4 / 2026-08-19, scratch/ceilings_r4.py): best-case
# conv 119 TF/s / 8192^3 matmul 143 TF/s bf16, model-shape convs 62-84
# TF/s → 110 TF/s roofline; elementwise HBM stream 556 GB/s, IN-style
# stats+norm 230 GB/s eff → 550 GB/s roofline.
DEFAULT_FLOPS_CEILING = 110e12
DEFAULT_BW_CEILING = 550e9

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1, "f8e4m3": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
    "token": 0, "opaque": 0,
}

# One array shape inside an HLO type string: ``bf16[8,64,64,32]{...}``.
_ARRAY_RE = re.compile(r"([a-z]\w*)\[([\d,]*)\]")

_NAME_RE = re.compile(r"^%?([\w.\-]+)\s*=\s*")
_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.")


def _parse_shapes(type_str: str) -> List[Tuple[str, List[int]]]:
    """All (dtype, dims) arrays in an HLO type string (handles tuples)."""
    out = []
    for m in _ARRAY_RE.finditer(type_str):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _DTYPE_BYTES:
            continue
        out.append((dtype, [int(d) for d in dims.split(",") if d]))
    return out


def _shape_bytes(type_str: str) -> int:
    return sum(
        _DTYPE_BYTES[dt] * math.prod(dims) if dims else _DTYPE_BYTES[dt]
        for dt, dims in _parse_shapes(type_str)
    )


def _first_shape(type_str: str) -> Optional[List[int]]:
    shapes = _parse_shapes(type_str)
    return shapes[0][1] if shapes else None


def _pad128(c: int) -> int:
    return max(128, ((c + 127) // 128) * 128)


class _Instr:
    __slots__ = ("name", "type_str", "opcode", "rest", "operands")

    def __init__(self, name: str, type_str: str, opcode: str, rest: str):
        self.name = name
        self.type_str = type_str
        self.opcode = opcode
        self.rest = rest
        # Operand names: %foo references inside the call parens (first
        # balanced group of `rest`).
        depth, end = 1, 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        self.operands = re.findall(r"%([\w.\-]+)", rest[:end])


def _parse_instr(line: str) -> Optional[_Instr]:
    """Parse ``[ROOT] %name = TYPE opcode(operands), attrs`` with a depth
    scanner (tuple types contain spaces and parens, so token splitting and
    naive regexes both break)."""
    s = line.strip()
    if s.startswith("ROOT "):
        s = s[5:]
    m = _NAME_RE.match(s)
    if not m:
        return None
    name = m.group(1)
    rest = s[m.end():]
    depth = 0
    ident_start: Optional[int] = None
    for i, ch in enumerate(rest):
        if ch == "(" and depth == 0 and ident_start is not None:
            opcode = rest[ident_start:i]
            return _Instr(name, rest[:ident_start].strip(), opcode,
                          rest[i + 1:])
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif depth == 0:
            if ch in _IDENT_CHARS:
                if ident_start is None:
                    ident_start = i
            else:
                ident_start = None
    return None


def _split_computations(text: str) -> Dict[str, List[_Instr]]:
    """computation name -> instruction list. Entry computation is stored
    under the extra key ``__entry__`` as well."""
    comps: Dict[str, List[_Instr]] = {}
    cur: Optional[List[_Instr]] = None
    entry_name = None
    for line in text.splitlines():
        stripped = line.strip()
        header = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(\([^=]*=?.*)?\{\s*$",
                          stripped)
        if cur is None and header and ("->" in stripped or
                                       stripped.startswith("ENTRY")):
            name = header.group(2)
            cur = comps.setdefault(name, [])
            if header.group(1):
                entry_name = name
            continue
        if cur is not None:
            if stripped == "}":
                cur = None
                continue
            ins = _parse_instr(line)
            if ins is not None:
                cur.append(ins)
    if entry_name is not None:
        comps["__entry__"] = comps[entry_name]
    return comps


def _conv_flops(instr: _Instr, shapes: Dict[str, str]) -> Tuple[float, float]:
    """(useful, lane-padded) FLOPs of a convolution instruction."""
    out = _first_shape(instr.type_str)
    if out is None:
        return 0.0, 0.0
    window = re.search(r"window=\{[^}]*?size=([\dx]+)", instr.rest)
    ksize = math.prod(int(k) for k in window.group(1).split("x")) if window \
        else 1
    labels = re.search(r"dim_labels=(\S+?)_(\S+?)->(\S+)", instr.rest)
    cin = None
    cout_idx = None
    if labels and len(instr.operands) >= 2:
        rhs_spec = labels.group(2).rstrip(",")
        out_spec = labels.group(3).rstrip(",")
        rhs_shape = _first_shape(shapes.get(instr.operands[1], ""))
        if rhs_shape is not None and "i" in rhs_spec:
            cin = rhs_shape[rhs_spec.index("i")]
        if "f" in out_spec:
            cout_idx = out_spec.index("f")
    if cin is None:
        return 0.0, 0.0
    groups = re.search(r"feature_group_count=(\d+)", instr.rest)
    g = int(groups.group(1)) if groups else 1
    cout = out[cout_idx] if cout_idx is not None else out[-1]
    useful = 2.0 * math.prod(out) * ksize * cin
    padded = useful * (_pad128(cin) / cin) * (_pad128(cout) / cout) / g
    return useful, padded


def _dot_flops(instr: _Instr, shapes: Dict[str, str]) -> Tuple[float, float]:
    lhs = _first_shape(shapes.get(instr.operands[0], "")) if instr.operands \
        else None
    out = _first_shape(instr.type_str)
    if lhs is None or out is None:
        return 0.0, 0.0
    cdims = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", instr.rest)
    k = 1
    if cdims:
        for d in cdims.group(1).split(","):
            if d:
                k *= lhs[int(d)]
    useful = 2.0 * math.prod(out) * k
    n = out[-1] if out else 1
    padded = useful * (_pad128(k) / k) * (_pad128(n) / max(n, 1))
    return useful, padded


def _computation_flops(
    comp: List[_Instr],
    comps: Dict[str, List[_Instr]],
    global_shapes: Dict[str, str],
) -> Tuple[float, float, List[str]]:
    """Total (useful, padded) FLOPs of a computation body, recursing into
    fusions/calls; also returns descriptions of heavy ops found.

    Operand shapes resolve computation-locally first: instruction names
    (``%param_0.1`` etc.) are NOT globally unique across fused computations.
    """
    shapes = dict(global_shapes)
    shapes.update({ins.name: ins.type_str for ins in comp})
    useful = padded = 0.0
    heavy: List[str] = []
    for ins in comp:
        if ins.opcode == "convolution":
            u, p = _conv_flops(ins, shapes)
            useful += u
            padded += p
            out = _first_shape(ins.type_str)
            win = re.search(r"size=([\dx]+)", ins.rest)
            heavy.append(f"conv{win.group(1) if win else '?'}"
                         f"->{'x'.join(map(str, out or []))}")
        elif ins.opcode == "dot":
            u, p = _dot_flops(ins, shapes)
            useful += u
            padded += p
            out = _first_shape(ins.type_str)
            heavy.append(f"dot->{'x'.join(map(str, out or []))}")
        else:
            called = re.search(r"calls=%?([\w.\-]+)", ins.rest)
            if called and called.group(1) in comps:
                u, p, h = _computation_flops(
                    comps[called.group(1)], comps, shapes)
                useful += u
                padded += p
                heavy.extend(h)
    return useful, padded, heavy


def cost_table_from_text(
    hlo_text: str,
    flops_ceiling: float = DEFAULT_FLOPS_CEILING,
    bw_ceiling: float = DEFAULT_BW_CEILING,
) -> List[Dict[str, Any]]:
    """Parse optimized HLO text into per-entry-instruction cost rows.

    Each row: name, opcode, op_name (source metadata), shape, flops,
    flops_padded, bytes, t_compute_us, t_memory_us, t_roofline_us, bound.
    Zero-cost bookkeeping ops (parameters, bitcasts, tuples, constants)
    are skipped.
    """
    comps = _split_computations(hlo_text)
    entry = comps.get("__entry__", [])
    # Name -> type string map for operand shapes. Entry-computation names
    # take priority: fused computations reuse names like ``%param_0.1``.
    shapes: Dict[str, str] = {}
    for comp in comps.values():
        for ins in comp:
            shapes.setdefault(ins.name, ins.type_str)
    shapes.update({ins.name: ins.type_str for ins in entry})
    # Parameters of each computation carry shapes in the header we did not
    # parse; fall back: operands missing from `shapes` contribute 0 bytes.
    skip = {
        "parameter", "bitcast", "tuple", "get-tuple-element", "constant",
        "after-all", "partition-id", "replica-id", "iota",
    }
    rows: List[Dict[str, Any]] = []
    for ins in entry:
        if ins.opcode in skip:
            continue
        out_bytes = _shape_bytes(ins.type_str)
        in_bytes = sum(
            _shape_bytes(shapes[op]) for op in set(ins.operands)
            if op in shapes
        )
        if ins.opcode == "convolution":
            useful, padded = _conv_flops(ins, shapes)
            heavy = ["conv"]
        elif ins.opcode == "dot":
            useful, padded = _dot_flops(ins, shapes)
            heavy = ["dot"]
        else:
            called = re.search(r"calls=%?([\w.\-]+)", ins.rest)
            if called and called.group(1) in comps:
                useful, padded, heavy = _computation_flops(
                    comps[called.group(1)], comps, shapes)
            else:
                useful = padded = 0.0
                heavy = []
        total_bytes = out_bytes + in_bytes
        if useful == 0.0 and total_bytes == 0:
            continue
        t_c = padded / flops_ceiling * 1e6
        t_m = total_bytes / bw_ceiling * 1e6
        op_name = re.search(r'op_name="([^"]*)"', ins.rest)
        rows.append({
            "name": ins.name,
            "opcode": ins.opcode,
            "op_name": op_name.group(1) if op_name else "",
            "shape": ins.type_str.split("{")[0].strip(),
            "flops": useful,
            "flops_padded": padded,
            "bytes": total_bytes,
            "t_compute_us": t_c,
            "t_memory_us": t_m,
            "t_roofline_us": max(t_c, t_m),
            "bound": "compute" if t_c >= t_m else "memory",
            "heavy_ops": heavy,
        })
    return rows


def cost_table(
    fn: Callable,
    *args: Any,
    flops_ceiling: float = DEFAULT_FLOPS_CEILING,
    bw_ceiling: float = DEFAULT_BW_CEILING,
    **jit_kwargs: Any,
) -> List[Dict[str, Any]]:
    """Compile ``fn(*args)`` (no execution) and return its cost table."""
    import jax

    compiled = jax.jit(fn, **jit_kwargs).lower(*args).compile()
    return cost_table_from_text(
        compiled.as_text(), flops_ceiling=flops_ceiling,
        bw_ceiling=bw_ceiling)


def summarize(rows: Iterable[Dict[str, Any]]) -> Dict[str, float]:
    rows = list(rows)
    return {
        "n_ops": len(rows),
        "flops": sum(r["flops"] for r in rows),
        "flops_padded": sum(r["flops_padded"] for r in rows),
        "bytes": sum(r["bytes"] for r in rows),
        "t_roofline_ms": sum(r["t_roofline_us"] for r in rows) / 1e3,
        "t_compute_ms": sum(r["t_compute_us"] for r in rows) / 1e3,
        "t_memory_ms": sum(r["t_memory_us"] for r in rows) / 1e3,
    }


def format_table(rows: List[Dict[str, Any]], top: int = 25) -> str:
    rows = sorted(rows, key=lambda r: -r["t_roofline_us"])
    s = summarize(rows)
    lines = [
        f"{'roofline_us':>11} {'bound':>7} {'GFLOP(pad)':>11} "
        f"{'MB':>8}  op",
    ]
    for r in rows[:top]:
        desc = r["op_name"] or r["name"]
        hv = f" [{r['heavy_ops'][0]}x{len(r['heavy_ops'])}]" \
            if r["heavy_ops"] else ""
        lines.append(
            f"{r['t_roofline_us']:>11.1f} {r['bound']:>7} "
            f"{r['flops_padded'] / 1e9:>11.2f} "
            f"{r['bytes'] / 1e6:>8.1f}  {desc[:90]}{hv}"
        )
    lines.append(
        f"TOTAL {s['n_ops']} ops: {s['flops'] / 1e12:.2f} TF useful, "
        f"{s['flops_padded'] / 1e12:.2f} TF padded, "
        f"{s['bytes'] / 1e9:.2f} GB, roofline {s['t_roofline_ms']:.1f} ms "
        f"(compute {s['t_compute_ms']:.1f} / memory {s['t_memory_ms']:.1f})"
    )
    return "\n".join(lines)


def _group_by_op_name(rows: Iterable[Dict[str, Any]]) -> Dict[str, Dict]:
    groups: Dict[str, Dict[str, float]] = {}
    for r in rows:
        key = r["op_name"] or r["opcode"]
        g = groups.setdefault(
            key, {"t_roofline_us": 0.0, "bytes": 0, "flops_padded": 0.0,
                  "n": 0})
        g["t_roofline_us"] += r["t_roofline_us"]
        g["bytes"] += r["bytes"]
        g["flops_padded"] += r["flops_padded"]
        g["n"] += 1
    return groups


def diff_tables(
    rows_a: List[Dict[str, Any]],
    rows_b: List[Dict[str, Any]],
) -> List[Dict[str, Any]]:
    """Compare two cost tables grouped by source op_name. Returns rows with
    the roofline delta (b minus a), biggest absolute delta first."""
    ga, gb = _group_by_op_name(rows_a), _group_by_op_name(rows_b)
    out = []
    for key in sorted(set(ga) | set(gb)):
        a = ga.get(key, {"t_roofline_us": 0.0, "bytes": 0,
                         "flops_padded": 0.0, "n": 0})
        b = gb.get(key, {"t_roofline_us": 0.0, "bytes": 0,
                         "flops_padded": 0.0, "n": 0})
        out.append({
            "op_name": key,
            "a_us": a["t_roofline_us"], "b_us": b["t_roofline_us"],
            "delta_us": b["t_roofline_us"] - a["t_roofline_us"],
            "a_bytes": a["bytes"], "b_bytes": b["bytes"],
            "a_n": a["n"], "b_n": b["n"],
        })
    out.sort(key=lambda r: -abs(r["delta_us"]))
    return out


def format_diff(diff: List[Dict[str, Any]], top: int = 20) -> str:
    lines = [f"{'a_us':>10} {'b_us':>10} {'delta':>10} {'a_MB':>8} "
             f"{'b_MB':>8}  op_name"]
    for r in diff[:top]:
        lines.append(
            f"{r['a_us']:>10.1f} {r['b_us']:>10.1f} {r['delta_us']:>+10.1f} "
            f"{r['a_bytes'] / 1e6:>8.1f} {r['b_bytes'] / 1e6:>8.1f}  "
            f"{r['op_name'][:80]}"
        )
    ta = sum(r["a_us"] for r in diff)
    tb = sum(r["b_us"] for r in diff)
    lines.append(f"TOTAL roofline: a={ta / 1e3:.2f} ms  b={tb / 1e3:.2f} ms  "
                 f"delta={(tb - ta) / 1e3:+.2f} ms")
    return "\n".join(lines)
