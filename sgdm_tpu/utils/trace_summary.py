"""Summarize a jax profiler xplane trace: top TPU ops by accumulated time.

Usage:
  python -m sgdm_tpu.utils.trace_summary outputs/<run>/profile

Parses the `.xplane.pb` written by `profile=1` runs (utils/profiling.py /
training.trainer) with the tsl protobufs that ship inside tensorflow — no
TensorBoard needed.  This is the round-to-round optimization loop: trace,
read the top fusions, attack the biggest ones.
"""

from __future__ import annotations

import collections
import glob
import sys


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
        stats: collections.Counter = collections.Counter()
        steps = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.startswith("jit_train_step"):
                    steps += 1
                    continue
                if name.isdigit():  # step-number lines
                    continue
                stats[name] += ev.duration_ps
        print(f"== {plane.name} ({steps} train steps)")
        for name, dur in stats.most_common(top):
            print(f"  {dur/1e9:9.1f} ms  {name[:110]}")
        return
    print("no TPU plane found")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
