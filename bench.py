"""Benchmark: lidar odometry frames/s on one chip, synthetic HDL-64 sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline = the reference's hard real-time budget of 10 frames/s (it warns at
>100 ms/frame, laserOdometry.cpp:666-667, and publishes no other numbers —
BASELINE.md); vs_baseline is the speedup over that 10 fps requirement.
The north-star target is > 2× real time (vs_baseline > 2).
"""

import json
import time

import numpy as np


def main():
    import jax

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models.pipeline import OdometryPipeline
    from lidar_visual_odometry_tpu.utils.config import SystemConfig

    n_frames = 41  # 40 odometry frames = 5 chunks of 8 (one compiled chunk shape)
    seq = synthetic.SyntheticSequence(
        n_frames=n_frames, width=1800, speed=1.0, yaw_rate=0.004, noise=0.01
    )
    # deterministic scans: cache renders to disk (raycasting costs ~2 min)
    import os

    cache = os.path.join(os.path.dirname(__file__), ".bench_scans.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        scans = [data[f"s{k}"] for k in range(n_frames)]
    else:
        scans = [seq.scan(k) for k in range(n_frames)]
        np.savez_compressed(cache, **{f"s{k}": s for k, s in enumerate(scans)})
    gt = np.stack([seq.pose(k)[1] for k in range(n_frames)])

    # warmup / compile
    pipe = OdometryPipeline(SystemConfig())
    pipe.run_chunked(scans[:9], chunk=8, quantize=True)

    pipe = OdometryPipeline(SystemConfig())
    t0 = time.time()
    result = pipe.run_chunked(scans, chunk=8, quantize=True)
    wall = time.time() - t0
    fps = (n_frames - 1) / wall

    ate = metrics.ate_rmse(result.positions, gt)
    device = str(jax.devices()[0])

    print(
        json.dumps(
            {
                "metric": "lidar_odometry_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 2),
                "ate_rmse_m": round(ate, 4),
                "frames": n_frames - 1,
                "device": device,
            }
        )
    )


if __name__ == "__main__":
    main()
