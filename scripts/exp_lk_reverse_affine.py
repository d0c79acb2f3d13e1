"""A/B: affine vs translation-only reverse-check leg in the visual chunk.

The forward LK solve keeps the 6-DOF affine deformation compensation (the
feature-VO drift fix); the question is whether the reverse CHECK — a 1 px
round-trip gate warm-started at the exact negated forward flow — needs it
too. Measured per-call on v5e (bench shape, warm start): affine 3.62 ms vs
translation-only 0.84 ms, because the affine setup (21 column sums + 6×6
Cholesky per feature) is paid even when the eps loop exits immediately.
This script runs the full cam-lidar bench section both ways and reports
fps + ate_visual (+ per-frame device ms when tracing is available).

Usage: python scripts/exp_lk_reverse_affine.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.eval import metrics
from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import CamLidarPipeline


def main():
    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    base = bench._config()
    R0, t00 = seq.pose(0)
    gt_rel = np.stack(
        [R0.T @ (seq.pose(k)[1] - t00) for k in range(bench.N_FRAMES)]
    )

    for rev_aff in (True, "fixed", False):
        cfg = dataclasses.replace(
            base,
            visual=dataclasses.replace(
                base.visual, lk_reverse_affine=rev_aff
            ),
        )
        CamLidarPipeline(cfg).run_chunked(
            scans, images, chunk=8, ingest="polar2"
        )  # warm
        best = 0.0
        out = None
        for _ in range(3):
            t0 = time.time()
            out = CamLidarPipeline(cfg).run_chunked(
                scans, images, chunk=8, ingest="polar2"
            )
            best = max(best, (bench.N_FRAMES - 1) / (time.time() - t0))
        ate = metrics.ate_rmse(out.visual_positions, gt_rel, align=False)
        dev = bench._trace_device_ms(
            lambda: CamLidarPipeline(cfg).run_chunked(
                scans, images, chunk=8, ingest="polar2"
            ),
            bench.N_FRAMES - 1, f"revaff{rev_aff}",
        )
        devs = f"{dev:.2f}" if dev is not None else "n/a"
        print(
            f"reverse_affine={rev_aff}: {best:6.2f} fps  "
            f"ate_visual {ate:.4f} m  device {devs} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
