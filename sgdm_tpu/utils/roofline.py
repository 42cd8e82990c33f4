"""Per-fusion HBM-traffic / roofline audit of the flagship train step.

Round-3 deliverable (VERDICT #2): turn the prose bandwidth claims into
data.  For a compiled program this module produces a top-N table

    fusion name | HBM bytes | measured ms | GB/s | % of step

by combining two sources:

  * **bytes** — parsed from the optimized HLO (`compiled.as_text()`):
    every top-level entry-computation instruction's traffic is
    sum(operand buffer sizes) + result size.  For XLA fusions this is the
    actual HBM traffic (fusion internals stay in registers/VMEM); for
    Pallas custom-calls it's the kernel's true in/out DMA volume.
    Parameter-operand bytes are included (weights stream from HBM too).
  * **ms** — accumulated per-op durations from a jax profiler xplane
    trace of the same program (trace_summary.py parsing rules: async DMA
    windows excluded).

Roofline attainment = achieved GB/s vs the measured effective HBM rate
(357 GB/s on the bench v5e-lite, BASELINE.md round 2).  A v4-8 projection
scales the bandwidth-bound fraction by the v4 HBM ratio (1228/819 GB/s
nominal v4 vs v5e → ~1.5x) and the MXU-bound fraction by peak-FLOPs ratio
(275/197 TF/s bf16 ≈ 1.4x).

CLI:
  python -m sgdm_tpu.utils.roofline [--mode fused|xla] [--batch-size N]
  (TPU required; writes the table to stdout for BASELINE.md.)
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass, field

__all__ = ["hlo_traffic", "audit_train_step"]

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2, "f8e4m3": 1,
    "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of all array literals inside an HLO shape string
    (handles tuples by summing every `dtype[dims]` occurrence)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


@dataclass
class OpTraffic:
    name: str
    kind: str
    out_bytes: int
    in_bytes: int
    ms: float = 0.0

    @property
    def bytes(self) -> int:
        return self.out_bytes + self.in_bytes


_LHS_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_KIND_RE = re.compile(r"([\w\-]+)\(")


def _parse_instr(line: str):
    """(name, result_shape, opcode, args_rhs) for an HLO instruction line;
    None otherwise.  Handles tuple result shapes whose layouts contain
    parens (e.g. `(f32[8,128]{1,0:T(8,128)}, ...)`)."""
    m = _LHS_RE.match(line)
    if not m:
        return None
    name, rhs = m.groups()
    rhs = rhs.lstrip()
    if rhs.startswith("("):  # tuple shape: take the balanced prefix
        depth = 0
        end = 0
        for i, ch in enumerate(rhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        shape, rest = rhs[:end + 1], rhs[end + 1:].lstrip()
    else:
        shape, _, rest = rhs.partition(" ")
    km = _KIND_RE.match(rest)
    if not km:
        return None
    return name, shape, km.group(1), rest[km.end():]


def hlo_traffic(hlo_text: str) -> dict[str, OpTraffic]:
    """Per-instruction HBM traffic of the ENTRY computation of an
    optimized HLO module."""
    # result-shape lookup for every instruction in the module (operands may
    # reference fusion outputs defined in the entry computation only — but
    # build the full map to be safe)
    shapes: dict[str, str] = {}
    for line in hlo_text.splitlines():
        p = _parse_instr(line)
        if p:
            shapes[p[0]] = p[1]

    # find the entry computation: "ENTRY %name (..) -> .. {" … "}"
    entry = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            entry.append(line)

    ops: dict[str, OpTraffic] = {}
    for line in entry:
        p = _parse_instr(line)
        if not p:
            continue
        name, shape_str, kind, rhs = p
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast"):
            continue
        out_b = _shape_bytes(shape_str)
        # operands: %name refs on the right-hand side
        in_b = 0
        for ref in re.findall(r"%([\w.\-]+)", rhs):
            if ref in shapes:
                in_b += _shape_bytes(shapes[ref])
        ops[name] = OpTraffic(name, kind, out_b, in_b)
    return ops


def _trace_ms(profile_dir: str) -> tuple[dict[str, float], float, int]:
    """name → total ms across steps; plus (step_ms, n_steps)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:  # pragma: no cover
        from tsl.profiler.protobuf import xplane_pb2
    import glob

    paths = glob.glob(f"{profile_dir}/plugins/profile/*/*.xplane.pb")
    assert paths, f"no xplane.pb under {profile_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    out: dict[str, float] = {}
    step_ms, steps = 0.0, 0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "Steps":
                steps = len(line.events)
                step_ms = sum(ev.duration_ps for ev in line.events) / 1e9
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                raw = ev_meta.get(ev.metadata_id, "?")
                nm = raw.split(" =")[0].lstrip("%")
                # async DMA windows (in-flight spans, not occupancy) —
                # same set trace_summary._categorize excludes
                if nm.startswith(("copy-start", "copy-done", "slice-start",
                                  "slice-done", "dynamic-slice-start",
                                  "dynamic-slice-done",
                                  "dynamic-update-slice-start",
                                  "dynamic-update-slice-done")):
                    continue
                out[nm] = out.get(nm, 0.0) + ev.duration_ps / 1e9
        break
    return out, step_ms, steps


def audit_train_step(mode: str = "fused", batch_size: int = 192,
                     top: int = 20, channels: int = 128,
                     image_size: int = 64, cond_dim: int = 1000,
                     hbm_gbps: float = 357.0, iters: int = 5) -> None:
    """Compile + trace the flagship train step; print the traffic table."""
    import os
    import tempfile

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import bench as _bench

    use_pallas = {"fused": "fused", "xla": False, "pallas": True}[mode]
    model, diffusion, state, step, batch = _bench.build(
        batch_size, image_size, cond_dim, channels, use_pallas=use_pallas,
    )
    rng = jax.random.PRNGKey(1)
    # warm (compile)
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    # optimized HLO of the jitted step
    lowered = step.lower(state, batch, rng) if hasattr(step, "lower") else None
    if lowered is None:
        raise RuntimeError("train step is not a jitted callable")
    hlo = lowered.compile().as_text()
    ops = hlo_traffic(hlo)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                state, metrics = step(state, batch, rng)
            jax.block_until_ready(metrics["loss"])
        ms_by_name, step_ms, steps = _trace_ms(td)
    per_step = {n: v / max(steps, 1) for n, v in ms_by_name.items()}
    for n, t in per_step.items():
        if n in ops:
            ops[n].ms = t
    measured_step_ms = step_ms / max(steps, 1)

    rows = sorted(ops.values(), key=lambda o: o.ms, reverse=True)
    total_bytes = sum(o.bytes for o in rows)
    total_out = sum(o.out_bytes for o in rows)
    total_ms = sum(o.ms for o in rows)
    print(f"# mode={mode} bs={batch_size} ch={channels} {image_size}px — "
          f"{steps} traced steps, {measured_step_ms:.1f} ms/step "
          f"(sync-op sum {total_ms:.1f} ms)")
    # two traffic bounds: written bytes (every result is materialized once
    # — a conservative HBM floor) and operand+result bytes (an upper bound:
    # multi-consumer reads count per consumer, and MSA-staged VMEM copies
    # mean some 'reads' never touch HBM again)
    dt_s = measured_step_ms / 1e3
    print(f"# traffic: written {total_out / 1e9:.1f} GB/step "
          f"({total_out / 1e9 / dt_s:.0f} GB/s, "
          f"{total_out / 1e9 / dt_s / hbm_gbps:.0%} of {hbm_gbps:.0f} GB/s "
          f"measured peak) · operand+result upper bound "
          f"{total_bytes / 1e9:.1f} GB/step")
    print(f"{'fusion':58s} {'GB':>7s} {'ms':>7s} {'GB/s':>6s} {'%step':>6s}")
    for o in rows[:top]:
        gbs = o.bytes / 1e9 / (o.ms / 1e3) if o.ms > 0 else float("nan")
        print(f"{o.name[:58]:58s} {o.bytes / 1e9:7.3f} {o.ms:7.2f} "
              f"{gbs:6.0f} {o.ms / measured_step_ms:6.1%}")
    rest_b = sum(o.bytes for o in rows[top:])
    rest_ms = sum(o.ms for o in rows[top:])
    print(f"{'(remaining ' + str(max(len(rows) - top, 0)) + ' ops)':58s} "
          f"{rest_b / 1e9:7.3f} {rest_ms:7.2f}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["fused", "xla", "pallas"],
                   default="fused")
    p.add_argument("--batch-size", type=int, default=192)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--iters", type=int, default=5)
    a = p.parse_args()
    audit_train_step(mode=a.mode, batch_size=a.batch_size, top=a.top,
                     iters=a.iters)
