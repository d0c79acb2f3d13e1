#!/usr/bin/env python
"""Long-horizon stress for the VISUAL modes (VERDICT r4 next #7).

The 500-frame multi-lap drive of ``stress_long.py`` (two 180-degree U-turns
per lap) through the two benchmarked visual paths:

* tightly-coupled cam-lidar + mapping (the reference's full topology,
  ``CamLidarProcess.cpp:278-307`` coupling live): feature-slot churn and the
  plausibility-gate fallback through U-turns the camera cannot survive,
* direct photometric VO with per-frame window BA (``Tracker2.cpp:60-81`` +
  ``WindowOptimizer.cpp:68-148``): keyframe-window behavior through turns,

each with a MID-RUN kill + ``--resume`` that must reproduce the
uninterrupted trajectory bit-exactly (the runner-level checkpoint wiring of
``utils/checkpoint.py`` under real length). Images render at the bench
camera (640×192) and cache beside the scans.

Usage:
    python scripts/stress_visual.py [--laps 4] [--leg 50] [--cpu]
    python scripts/stress_visual.py --skip-direct   # coupled only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CAM = dict(fx=240.0, fy=240.0, cx=320.0, cy=96.0, width=640, height=192)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=4)
    ap.add_argument("--leg", type=int, default=50)
    ap.add_argument("--turn", type=int, default=14)
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-direct", action="store_true")
    ap.add_argument("--skip-coupled", action="store_true")
    ap.add_argument("--no-resume-check", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
        CamLidarPipeline, _map_cam_poses_to_lidar,
    )
    from lidar_visual_odometry_tpu.models.direct_vo import DirectVOChunked
    from lidar_visual_odometry_tpu.ops import camera as cam_ops
    from lidar_visual_odometry_tpu.ops import se3
    from lidar_visual_odometry_tpu.utils.config import (
        CameraConfig, ExtrinsicConfig, SystemConfig, VisualConfig,
    )

    lap = (
        (args.leg, 1.0, 0.0),
        (args.turn, 0.6, np.pi / args.turn),
        (args.leg, 1.0, 0.0),
        (args.turn, 0.6, np.pi / args.turn),
    )
    seq = synthetic.PiecewiseArcSequence(
        width=args.width, noise=0.01, segments=lap * args.laps,
    )
    n = seq.n_frames
    here = os.path.dirname(os.path.abspath(__file__))
    tag = f"{args.laps}x{args.leg}_{args.turn}_{args.width}"
    scan_cache = os.path.join(here, "..", f".stress_scans_{tag}.npz")
    img_cache = os.path.join(
        here, "..", f".stress_imgs_{tag}_{CAM['width']}x{CAM['height']}.npz"
    )
    if os.path.exists(scan_cache):
        data = np.load(scan_cache)
        scans = [data[f"s{k}"] for k in range(n)]
    else:
        t0 = time.time()
        scans = [seq.scan(k) for k in range(n)]
        print(f"rendered {n} scans in {time.time() - t0:.0f}s", flush=True)
        np.savez_compressed(scan_cache,
                            **{f"s{k}": s for k, s in enumerate(scans)})
    if os.path.exists(img_cache):
        data = np.load(img_cache)
        images = [data[f"i{k}"] for k in range(n)]
    else:
        t0 = time.time()
        images = []
        for k in range(n):
            Rc, tc = synthetic.camera_from_velodyne_pose(*seq.pose(k))
            img, _ = synthetic.render_image(seq.scene, Rc, tc, **CAM)
            images.append(img)
            if k % 100 == 0:
                print(f"  rendered {k}/{n} images", flush=True)
        print(f"rendered {n} images in {time.time() - t0:.0f}s", flush=True)
        np.savez_compressed(img_cache,
                            **{f"i{k}": im for k, im in enumerate(images)})

    # bench-envelope config (640×192 camera, bench VisualConfig)
    R_sc = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    ext = tuple(tuple(float(v) for v in row) + (0.0,) for row in R_sc.T)
    cfg = SystemConfig(
        camera=CameraConfig(**CAM),
        visual=VisualConfig(
            depth_cloud_cap=16384, lk_window=13, lk_levels=3,
            lk_reverse_levels=1, lk_iters_coarse=4, max_tracked=768,
            grid_cols=25,  # matched replenish grid (bench._config)
        ),
        extrinsic=ExtrinsicConfig(matrix=ext),
    )

    R0, t0v = seq.pose(0)
    gt = np.stack([R0.T @ (seq.pose(k)[1] - t0v) for k in range(n)])
    gt_q = np.stack([
        np.asarray(se3.matrix_to_quat(
            jnp.asarray(R0.T @ seq.pose(k)[0], dtype=jnp.float32)))
        for k in range(n)
    ])

    def t_rel_of(qs, ts):
        return metrics.kitti_relative_errors(
            metrics.poses_to_matrices(qs, ts),
            metrics.poses_to_matrices(gt_q, gt), step=4,
        )

    report = {"frames": n, "laps": args.laps}

    if not args.skip_coupled:
        # ---- coupled cam-lidar + mapping: warm (compile), then timed ----
        pipe = CamLidarPipeline(cfg)
        pipe.run_chunked(scans, images, chunk=args.chunk, ingest="polar2",
                         coupled=True, mapping=True)
        t0 = time.time()
        res = pipe.run_chunked(scans, images, chunk=args.chunk,
                               ingest="polar2", coupled=True, mapping=True)
        np.asarray(res.mapped_positions)
        wall = time.time() - t0
        t_rel, r_rel = t_rel_of(res.mapped_quats, res.mapped_positions)
        report.update({
            "coupled_fps_warm": round((n - 1) / wall, 2),
            "coupled_ate_lidar_m": round(metrics.ate_rmse(
                res.lidar_positions, gt, align=False), 4),
            "coupled_ate_mapped_m": round(metrics.ate_rmse(
                res.mapped_positions, gt, align=False), 4),
            "coupled_ate_visual_m": round(metrics.ate_rmse(
                res.visual_positions, gt, align=False), 4),
            "coupled_t_rel_pct": round(float(t_rel), 3),
            "coupled_r_rel_deg_per_100m": round(float(r_rel), 4),
        })
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith("coupled") or k == "frames"}),
              flush=True)

        if not args.no_resume_check:
            ck = os.path.join(here, "..", ".stress_visual_coupled.ckpt.npz")
            pipe2 = CamLidarPipeline(cfg)
            pipe2.run_chunked(
                scans, images, chunk=args.chunk, ingest="polar2",
                coupled=True, mapping=True,
                checkpoint_path=ck, checkpoint_every=n // 2,
                stop_after=n // 2,
            )
            res_r = pipe2.run_chunked(
                scans, images, chunk=args.chunk, ingest="polar2",
                coupled=True, mapping=True,
                checkpoint_path=ck, resume=True,
            )
            exact = (
                np.array_equal(res_r.mapped_positions, res.mapped_positions)
                and np.array_equal(res_r.visual_positions,
                                   res.visual_positions)
                and np.array_equal(res_r.lidar_positions,
                                   res.lidar_positions)
            )
            report["coupled_resume_bit_exact"] = bool(exact)
            os.remove(ck)
            print(json.dumps(
                {"coupled_resume_bit_exact": bool(exact)}), flush=True)

    if not args.skip_direct:
        # ---- direct VO + per-frame window BA over the full drive ----
        clp = CamLidarPipeline(cfg)
        clouds, cmasks = [], []
        for s in scans:
            cf, cm = clp._cam_cloud(np.asarray(s)[:, :3])
            clouds.append(cf)
            cmasks.append(cm)
        cam = cam_ops.Pinhole.from_config(cfg.camera)
        dvo = DirectVOChunked(cam, cfg.visual, point_cap=2048)
        dvo.run_chunked(images, clouds, cmasks, chunk=args.chunk)  # warm
        ts_d, qs_d, wall_d = dvo.run_chunked(
            images, clouds, cmasks, chunk=args.chunk
        )
        dq, vt = _map_cam_poses_to_lidar(
            jnp.asarray(qs_d), jnp.asarray(ts_d),
            clp.T_lidar_cam, clp.T_cam_lidar,
        )
        t_rel_d, r_rel_d = t_rel_of(np.asarray(dq), np.asarray(vt))
        report.update({
            "direct_fps_warm": round((n - 1) / wall_d, 2),
            "direct_ate_m": round(metrics.ate_rmse(
                np.asarray(vt), gt, align=False), 4),
            "direct_t_rel_pct": round(float(t_rel_d), 3),
            "direct_r_rel_deg_per_100m": round(float(r_rel_d), 4),
        })
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith("direct")}), flush=True)

        if not args.no_resume_check:
            ck = os.path.join(here, "..", ".stress_visual_direct.ckpt.npz")
            dvo2 = DirectVOChunked(cam, cfg.visual, point_cap=2048)
            dvo2.run_chunked(
                images, clouds, cmasks, chunk=args.chunk,
                checkpoint_path=ck, checkpoint_every=n // 2,
                stop_after=n // 2,
            )
            ts_r, qs_r, _ = dvo2.run_chunked(
                images, clouds, cmasks, chunk=args.chunk,
                checkpoint_path=ck, resume=True,
            )
            exact = np.array_equal(ts_r, ts_d) and np.array_equal(qs_r, qs_d)
            report["direct_resume_bit_exact"] = bool(exact)
            os.remove(ck)
            print(json.dumps(
                {"direct_resume_bit_exact": bool(exact)}), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
