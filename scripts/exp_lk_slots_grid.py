"""Cam-lidar slots × replenish-grid sweep on the real TPU.

Round-4 measured "512 slots doubles ATE" with the DEFAULT 28×6×5 replenish
grid (840 candidates) — an oversubscribed table starves tracked features
(found by the round-5 rotation CI fixture: 840-vs-256 drifts meters). This
sweep separates feature COUNT from grid starvation: each slot budget runs
with the default grid and with a matched grid (candidates ≤ slots). The LK
kernel is feature-serial (roofline: serialization-bound), so fewer healthy
slots = proportional cam-lidar device time.

Usage: python scripts/exp_lk_slots_grid.py [--repeats 2]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.eval import metrics
from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
    CamLidarPipeline,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import time

    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    cfg = bench._config()
    n = bench.N_FRAMES
    R0, t00 = seq.pose(0)
    gt_rel = np.stack([R0.T @ (seq.pose(k)[1] - t00) for k in range(n)])

    # (slots, grid_cols, grid_rows, per_cell) — candidates = cols·rows·cell
    CONFIGS = [
        (768, 28, 6, 5, "bench default (840 cand, oversub 1.1x)"),
        (768, 25, 6, 5, "matched 750"),
        (512, 28, 6, 5, "r4's bad point (840 cand, oversub 1.6x)"),
        (512, 17, 6, 5, "matched 510"),
        (640, 21, 6, 5, "matched 630"),
    ]
    for slots, gc, gr, pc, note in CONFIGS:
        vcfg = dataclasses.replace(
            cfg.visual, max_tracked=slots, grid_cols=gc, grid_rows=gr,
            max_features_per_cell=pc,
        )
        scfg = dataclasses.replace(cfg, visual=vcfg)
        pipe = CamLidarPipeline(scfg)
        pipe.run_chunked(scans, images, chunk=8, ingest="polar2")  # warm
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.time()
            r = pipe.run_chunked(scans, images, chunk=8, ingest="polar2")
            best = max(best, (n - 1) / (time.time() - t0))
        ate = metrics.ate_rmse(r.visual_positions, gt_rel, align=False)
        print(f"slots={slots} grid={gc}x{gr}x{pc}: {best:6.1f} fps  "
              f"ate_visual {ate:.4f} m   [{note}]", flush=True)


if __name__ == "__main__":
    main()
