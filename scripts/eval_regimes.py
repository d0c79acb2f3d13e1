#!/usr/bin/env python
"""Accuracy evidence across hard regimes (VERDICT round-1 item 7).

Runs lidar odometry and odometry+mapping (device voxel map) over four
synthetic regimes — gentle corridor (long), rotation-heavy S-curve,
out-and-back revisit, and high sensor noise — and prints an ATE / t_rel
table. Results feed BASELINE.md's "Measured" section.

Usage:
    python scripts/eval_regimes.py          # TPU (default backend)
    python scripts/eval_regimes.py --cpu    # CPU smoke (smaller frames)
    python scripts/eval_regimes.py --frames 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=200,
                    help="frames for the long corridor regime")
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--sweep-outer", action="store_true",
                    help="also sweep mapping outer_iters on the rotation "
                         "regime (justifies the 2-vs-10 schedule)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.ops import se3
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models.pipeline import FullPipeline
    from lidar_visual_odometry_tpu.utils.config import SystemConfig

    W = args.width
    n_long = args.frames
    regimes = {
        f"corridor_{n_long}f": synthetic.SyntheticSequence(
            n_frames=n_long, width=W, yaw_rate=0.004, noise=0.01,
        ),
        "rotation_heavy": synthetic.PiecewiseArcSequence.s_curve(
            leg=20, yaw_rate=0.04, width=W, noise=0.01,
        ),
        "revisit_out_and_back": synthetic.PiecewiseArcSequence.out_and_back(
            leg=16, turn=12, width=W, noise=0.01,
        ),
        "high_noise": synthetic.SyntheticSequence(
            n_frames=30, width=W, yaw_rate=0.01, noise=0.05,
        ),
    }

    rows = []
    for name, seq in regimes.items():
        n = seq.n_frames
        scans = [seq.scan(k) for k in range(n)]
        R0, t0 = seq.pose(0)
        gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])

        pipe = FullPipeline(SystemConfig())
        odom, mapped = pipe.run_chunked(scans, chunk=8)
        row = {
            "regime": name,
            "frames": n,
            "ate_odom_m": round(
                metrics.ate_rmse(odom.positions, gt, align=False), 4
            ),
            "ate_mapped_m": round(
                metrics.ate_rmse(mapped.positions, gt, align=False), 4
            ),
        }
        try:
            gt_q = np.stack([
                np.asarray(se3.matrix_to_quat(
                    jnp.asarray(R0.T @ seq.pose(k)[0], dtype=jnp.float32)
                ))
                for k in range(n)
            ])
            path_len = float(
                np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
            )
            lengths = tuple(
                L for L in (20.0, 40.0, 80.0, 100.0, 160.0)
                if L < 0.9 * path_len
            ) or (path_len * 0.5,)
            t_rel, r_rel = metrics.kitti_relative_errors(
                metrics.poses_to_matrices(mapped.quaternions,
                                          mapped.positions),
                metrics.poses_to_matrices(gt_q, gt),
                lengths=lengths, step=4,
            )
            row["t_rel_pct"] = round(float(t_rel), 3)
            row["r_rel_deg_per_100m"] = round(float(r_rel), 4)
        except Exception as e:  # pragma: no cover - t_rel needs path length
            row["t_rel_err"] = str(e)[:60]
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.sweep_outer:
        # mapping iteration-schedule sweep (reference: 10 outer x 4 GN,
        # laserMapping.cpp:562,715) on the rotation-heavy regime
        import dataclasses

        from lidar_visual_odometry_tpu.utils.config import MappingConfig

        seq = regimes["rotation_heavy"]
        scans = [seq.scan(k) for k in range(seq.n_frames)]
        R0, t0 = seq.pose(0)
        gt = np.stack(
            [R0.T @ (seq.pose(k)[1] - t0) for k in range(seq.n_frames)]
        )
        for outer in (1, 2, 4, 10):
            cfg = SystemConfig(
                mapping=MappingConfig(outer_iters=outer)
            )
            _, mapped = FullPipeline(cfg).run_chunked(scans, chunk=8)
            row = {
                "sweep": "mapping_outer_iters",
                "outer_iters": outer,
                "ate_mapped_m": round(
                    metrics.ate_rmse(mapped.positions, gt, align=False), 4
                ),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
