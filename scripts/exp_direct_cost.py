"""Measure direct-VO fps + ATE across BA cost knobs on the real TPU.

Sweeps VisualConfig.{ba_points, ba_level, ba_iters, ba_step_tol} and the
tracker's per-level iteration budget over the cached bench sequence, printing
one line per configuration — the justification artifact for the defaults
(the window-BA sampling matmul runs at ~80% of the bf16x3 roofline, so the
only wins left are FLOP reductions; each must pay for its ATE cost here).

Usage: python scripts/exp_direct_cost.py [--repeats 2]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.eval import metrics
from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
    CamLidarPipeline, _map_cam_poses_to_lidar,
)
from lidar_visual_odometry_tpu.models.direct_vo import DirectVOChunked
from lidar_visual_odometry_tpu.ops import camera as cam_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    cfg0 = bench._config()
    clp = CamLidarPipeline(cfg0)
    clouds, cmasks = [], []
    for s in scans:
        cf, cm = clp._cam_cloud(np.asarray(s)[:, :3])
        clouds.append(cf)
        cmasks.append(cm)
    cam = cam_ops.Pinhole.from_config(cfg0.camera)
    R0, t00 = seq.pose(0)
    gt_rel = np.stack(
        [R0.T @ (seq.pose(k)[1] - t00) for k in range(bench.N_FRAMES)]
    )

    VARIANTS = [
        ("baseline", {}),
        ("ba_pts1024", {"ba_points": 1024}),
        ("ba_lvl2", {"ba_level": 2}),
        ("ba_iters2", {"ba_iters": 2}),
        # level-0 BA: the round-4 accuracy lever (CPU sweep: 0.168 ->
        # 0.042 m at i4; fewer than 4 iterations leaves the finest-level
        # solve mid-step and is WORSE than converged level-1)
        ("ba_lvl0_i4", {"ba_level": 0, "ba_iters": 4}),
        ("ba_lvl0_i8", {"ba_level": 0, "ba_iters": 8}),
        ("ba_lvl0_i4_pts1024", {"ba_level": 0, "ba_iters": 4,
                                "ba_points": 1024}),
    ]
    for name, over in VARIANTS:
        vcfg = dataclasses.replace(cfg0.visual, **over)
        dvo = DirectVOChunked(cam, vcfg, point_cap=2048)
        dvo.run_chunked(images, clouds, cmasks, chunk=8)  # warm/compile
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.time()
            ts_d, qs_d, wall = dvo.run_chunked(images, clouds, cmasks, chunk=8)
            np.asarray(ts_d)
            best = max(best, (bench.N_FRAMES - 1) / (time.time() - t0))
        _, vt = _map_cam_poses_to_lidar(
            jnp.asarray(qs_d), jnp.asarray(ts_d),
            clp.T_lidar_cam, clp.T_cam_lidar,
        )
        ate = metrics.ate_rmse(np.asarray(vt), gt_rel, align=False)
        print(f"{name:14s}  {best:6.1f} fps   ATE {ate:.4f} m", flush=True)


if __name__ == "__main__":
    main()
