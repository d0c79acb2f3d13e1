#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused cam-lidar chunk path on TPU.

Produces /tmp/jaxtrace (read with scripts/trace_report.py) so the per-op
device time of the visual chunk vs the lidar chunk is exact — per-RPC
wall-clock timing through the tunnel is confounded (CLAUDE.md).

Usage: python scripts/profile_camlidar_trace.py [--frames 17] [--chunk 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    args = ap.parse_args()

    import jax

    data_s = np.load(os.path.join(os.path.dirname(__file__), "..",
                                  ".bench_scans49.npz"))
    data_i = np.load(os.path.join(os.path.dirname(__file__), "..",
                                  ".bench_images49.npz"))
    n = args.frames
    scans = [data_s[f"s{k}"] for k in range(n)]
    images = [data_i[f"i{k}"] for k in range(n)]

    import bench

    cfg = bench._config()
    from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
        CamLidarPipeline,
    )

    CamLidarPipeline(cfg).run_chunked(scans, images, chunk=args.chunk,
                                      ingest="polar")  # warm/compile
    pipe = CamLidarPipeline(cfg)
    with jax.profiler.trace(args.trace_dir):
        pipe.run_chunked(scans, images, chunk=args.chunk, ingest="polar")
    print("trace written to", args.trace_dir,
          "- read with scripts/trace_report.py")


if __name__ == "__main__":
    main()
