#!/usr/bin/env python
"""Verify drive: fused odometry+mapping SLAM chunks on the real TPU.

Runs the synthetic benchmark sequence through FullPipeline.run_chunked
(device_mapping.slam_chunk_quantized) and prints fps + ATE for the odometry
and mapped trajectories.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models.pipeline import FullPipeline
    from lidar_visual_odometry_tpu.utils.config import SystemConfig

    n_frames = 41
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_scans.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        scans = [data[f"s{k}"] for k in range(n_frames)]
    else:
        seq = synthetic.SyntheticSequence(
            n_frames=n_frames, width=1800, speed=1.0, yaw_rate=0.004, noise=0.01
        )
        scans = [seq.scan(k) for k in range(n_frames)]
    seq = synthetic.SyntheticSequence(
        n_frames=n_frames, width=1800, speed=1.0, yaw_rate=0.004, noise=0.01
    )
    gt = np.stack([seq.pose(k)[1] for k in range(n_frames)])

    pipe = FullPipeline(SystemConfig())
    print("warmup/compile...", flush=True)
    t0 = time.time()
    pipe.run_chunked(scans[:9], chunk=8)
    print(f"compile+first chunk: {time.time()-t0:.1f}s", flush=True)

    pipe = FullPipeline(SystemConfig())
    t0 = time.time()
    odom, mapped = pipe.run_chunked(scans, chunk=8)
    wall = time.time() - t0

    print(json.dumps({
        "fused_slam_fps": round((n_frames - 1) / wall, 2),
        "ate_odom_m": round(metrics.ate_rmse(odom.positions, gt), 4),
        "ate_mapped_m": round(metrics.ate_rmse(mapped.positions, gt), 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
