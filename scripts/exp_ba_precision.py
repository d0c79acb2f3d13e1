"""Direct-VO window-BA sampler precision A/B on the real TPU.

The BA's (pairs, P·4, C·H) one-hot sampling contraction measures ~95% of
v5e bf16 MXU peak at HIGH (bf16x3) — MXU-bound at the PASS COUNT, so
single-pass bf16 (ba_sample_precision="bf16") is a ~3× lever on the
direct chunk's dominant op. This measures fps + corridor ATE for both.

Usage: python scripts/exp_ba_precision.py [--repeats 2]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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

    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    cfg = bench._config()

    clp = CamLidarPipeline(cfg)
    clouds, cmasks = [], []
    for s in scans:
        cf, cm = clp._cam_cloud(np.asarray(s)[:, :3])
        clouds.append(cf)
        cmasks.append(cm)
    cam = cam_ops.Pinhole.from_config(cfg.camera)
    n = len(images)
    R0, t00 = seq.pose(0)
    gt_rel = np.stack([R0.T @ (seq.pose(k)[1] - t00) for k in range(n)])

    for prec, radius in (("high", 0), ("bf16", 0), ("high", 2),
                         ("bf16", 2), ("bf16", 1)):
        vcfg = dataclasses.replace(
            cfg.visual, ba_sample_precision=prec, ba_pair_radius=radius,
        )
        dvo = DirectVOChunked(cam, vcfg, point_cap=2048)
        dvo.run_chunked(images, clouds, cmasks, chunk=8)  # warm
        best = 0.0
        for _ in range(args.repeats):
            ts_d, qs_d, wall = dvo.run_chunked(images, clouds, cmasks,
                                               chunk=8)
            best = max(best, (n - 1) / wall)
        _, vt = _map_cam_poses_to_lidar(
            jnp.asarray(qs_d), jnp.asarray(ts_d),
            clp.T_lidar_cam, clp.T_cam_lidar,
        )
        ate = metrics.ate_rmse(np.asarray(vt), gt_rel, align=False)
        print(f"ba_sample_precision={prec:<5} pair_radius={radius}: "
              f"{best:6.1f} fps  ATE {ate:.4f} m")


if __name__ == "__main__":
    main()
