"""Profile the fused direct-VO chunk on the real TPU: wall fps + xplane trace.

Reuses bench.py's cached synthetic sequence (.bench_scans49.npz /
.bench_images49.npz) so the shapes match the benchmarked configuration
exactly. Usage:

    python scripts/profile_direct.py [--trace /tmp/jaxtrace_direct]

then `python scripts/trace_report.py /tmp/jaxtrace_direct` for per-op times.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench
from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import CamLidarPipeline
from lidar_visual_odometry_tpu.models.direct_vo import DirectVOChunked
from lidar_visual_odometry_tpu.ops import camera as cam_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/jaxtrace_direct")
    ap.add_argument("--frames", type=int, default=bench.N_FRAMES)
    args = ap.parse_args()

    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    scans, images = scans[: args.frames], images[: args.frames]
    cfg = bench._config()

    clp = CamLidarPipeline(cfg)
    clouds, cmasks = [], []
    for s in scans:
        cf, cm = clp._cam_cloud(np.asarray(s)[:, :3])
        clouds.append(cf)
        cmasks.append(cm)
    cam = cam_ops.Pinhole.from_config(cfg.camera)
    dvo = DirectVOChunked(cam, cfg.visual, point_cap=2048)

    dvo.run_chunked(images, clouds, cmasks, chunk=8)  # warm/compile
    n = len(images)
    for tag in ("warm2", "traced"):
        if tag == "traced":
            jax.profiler.start_trace(args.trace)
        t0 = time.time()
        ts, qs, wall = dvo.run_chunked(images, clouds, cmasks, chunk=8)
        np.asarray(ts)  # force real D2H before reading the clock
        dt = time.time() - t0
        if tag == "traced":
            jax.profiler.stop_trace()
        print(f"{tag}: {n} frames in {dt:.2f}s -> {(n - 1) / dt:.1f} fps")
    print(f"trace in {args.trace}; run scripts/trace_report.py on it")


if __name__ == "__main__":
    main()
