"""Summarize a jax.profiler xplane trace: per-op device time, top-N.

Usage: python scripts/trace_report.py [trace_dir=/tmp/jaxtrace] [top_n=40]
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def report(trace_dir="/tmp/jaxtrace", top_n=40):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        print("no xplane.pb under", trace_dir)
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        stats = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            # XLA Ops lines carry per-op events; skip step lines
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                stats[(line.name, name)] += ev.duration_ps / 1e9
                counts[(line.name, name)] += 1
        by_line = collections.defaultdict(collections.Counter)
        for (ln, name), ms in stats.items():
            by_line[ln][name] += ms
        print(f"== plane: {plane.name}")
        for ln, ctr in by_line.items():
            total = sum(ctr.values())
            print(f"-- line: {ln}  total {total:.1f} ms")
            for name, ms in ctr.most_common(top_n):
                n = counts[(ln, name)]
                print(f"  {ms:9.2f} ms  x{n:<5d} {name[:100]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    report(args[0] if args else "/tmp/jaxtrace", int(args[1]) if len(args) > 1 else 40)
