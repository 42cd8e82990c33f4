"""Summarize a jax profiler xplane trace: top TPU ops by accumulated time.

Usage:
  python -m sgdm_tpu.utils.trace_summary outputs/<run>/profile [top_n]

Parses the `.xplane.pb` written by `profile=1` runs (utils/profiling.py /
training.trainer) with the tsl protobufs that ship inside tensorflow — no
TensorBoard needed.  This is the round-to-round optimization loop: trace,
read the top fusions, attack the biggest ones.

Notes on attribution (learned the hard way in round 2):
  * the 'XLA Ops' line mixes sync compute with async `copy-start/-done`
    DMA spans — an async copy's duration is its in-flight window, NOT
    occupancy, so copies are reported separately;
  * `S(1)` in layouts is the ALTERNATE memory space (VMEM prefetch by
    XLA's memory-space-assignment pass), not host memory — long copy-start
    spans are usually fine (prefetches issued early).
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def _categorize(name: str) -> str:
    if name.startswith(("%copy-start", "%copy-done", "%slice-start",
                        "%slice-done", "%dynamic-slice-start",
                        "%dynamic-slice-done")):
        return "ASYNC-DMA"
    if "convolution" in name:
        return "convolution"
    if "all-reduce" in name or "all-gather" in name or "reduce-scatter" in name:
        return "collective"
    m = re.match(r"%([a-z0-9_.\-]+?)(\.\d+)?(\.remat\d*)?(\.clone)? =", name)
    base = m.group(1) if m else name.split(" =")[0].lstrip("%")
    base = re.sub(r"\.\d+$", "", base)
    return base


def summarize(profile_dir: str, top: int = 25) -> None:
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:  # pragma: no cover - layout varies across TF versions
        from tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{profile_dir}/plugins/profile/*/*.xplane.pb")
    assert paths, f"no xplane.pb under {profile_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        byname: collections.Counter = collections.Counter()
        bycat: collections.Counter = collections.Counter()
        step_time = 0
        steps = 0
        for line in plane.lines:
            if line.name == "Steps":
                steps = len(line.events)
                step_time = sum(ev.duration_ps for ev in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                cat = _categorize(name)
                bycat[cat] += ev.duration_ps
                if cat != "ASYNC-DMA":
                    byname[name] += ev.duration_ps
        print(f"== {plane.name}: {steps} steps, "
              f"{step_time / 1e9 / max(steps, 1):.1f} ms/step")
        print("-- categories (ms total / ms per step):")
        for cat, dur in bycat.most_common(top):
            tag = "  [async window, overlaps compute]" if cat == "ASYNC-DMA" else ""
            print(f"  {dur/1e9:9.1f} {dur/1e9/max(steps,1):8.2f}  {cat}{tag}")
        print("-- top sync ops:")
        for name, dur in byname.most_common(top):
            print(f"  {dur/1e9:9.1f} ms  {name[:120]}")
        return
    print("no TPU plane found")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
