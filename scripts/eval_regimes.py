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
    ap.add_argument("--visual", action="store_true",
                    help="add visual-odometry rows (plain + tightly-coupled "
                         "cam-lidar) on the rotation/revisit regimes — "
                         "renders camera images (cached)")
    ap.add_argument("--imu", action="store_true",
                    help="add the bumpy-trajectory IMU-fusion regime "
                         "(synthetic IMU from GT poses; ImuFusedOdometry "
                         "vs plain odometry)")
    ap.add_argument("--direct", action="store_true",
                    help="add direct-photometric VO rows (plain Tracker2 "
                         "path and BA-every-frame) across all regimes — "
                         "the accuracy treatment the feature path got in "
                         "round 3 (VERDICT r3 item 3)")
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

    here = os.path.dirname(os.path.abspath(__file__))

    def load_scans(name, seq):
        """Raycasting 200 frames costs ~an hour of host time — cache the
        rendered scans per (regime, frame-count, width), like bench.py."""
        n = seq.n_frames
        cache = os.path.join(
            here, "..", f".eval_scans_{name}_{n}f_{args.width}w.npz"
        )
        if os.path.exists(cache):
            data = np.load(cache)
            return [data[f"s{k}"] for k in range(n)]
        scans = [seq.scan(k) for k in range(n)]
        np.savez_compressed(
            cache, **{f"s{k}": s for k, s in enumerate(scans)}
        )
        return scans

    rows = []
    for name, seq in regimes.items():
        n = seq.n_frames
        scans = load_scans(name, seq)
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

    if args.visual:
        # visual rows (VERDICT r2 weak #2: "nothing gates ate_visual"):
        # plain (side-by-side, the reference's shipped topology) and the
        # tightly-coupled mode (visual rel pose warm-starts the lidar GN,
        # CamLidarProcess.cpp:278-307 #if 0) on the two turn-heavy regimes
        from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
            CamLidarPipeline,
        )
        from lidar_visual_odometry_tpu.utils.config import (
            CameraConfig, ExtrinsicConfig, SystemConfig as SC, VisualConfig,
        )

        # BENCH-SCALE camera (VERDICT r4 weak #2: the old 320×96 rows
        # measured the camera, not the algorithm — at 15°/frame turns the
        # whole view left frame and every visual row read the FOV limit).
        # 640×192 is the benchmark's operating envelope; the VisualConfig
        # mirrors bench._config so the regime table discriminates actual
        # algorithm regressions at the shipped operating point.
        CAM = dict(fx=240.0, fy=240.0, cx=320.0, cy=96.0,
                   width=640, height=192)
        R_sc = np.array(
            [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]
        )
        ext = tuple(tuple(float(v) for v in row) + (0.0,) for row in R_sc.T)
        vcfg = SC(
            camera=CameraConfig(**CAM),
            visual=VisualConfig(
                depth_cloud_cap=16384, lk_window=13, lk_levels=3,
                lk_reverse_levels=1, lk_iters_coarse=4, max_tracked=768,
                grid_cols=25,  # matched replenish grid (bench._config)
            ),
            extrinsic=ExtrinsicConfig(matrix=ext),
        )
        here = os.path.dirname(os.path.abspath(__file__))

        def load_images(name, seq):
            n = seq.n_frames
            cache = os.path.join(
                here, "..",
                f".eval_imgs_{name}_{CAM['width']}x{CAM['height']}.npz",
            )
            if os.path.exists(cache):
                data = np.load(cache)
                return [data[f"i{k}"] for k in range(n)]
            images = []
            for k in range(n):
                Rc, tc = synthetic.camera_from_velodyne_pose(*seq.pose(k))
                img, _ = synthetic.render_image(seq.scene, Rc, tc, **CAM)
                images.append(img)
            np.savez_compressed(
                cache, **{f"i{k}": im for k, im in enumerate(images)}
            )
            return images

        for name in ("rotation_heavy", "revisit_out_and_back"):
            seq = regimes[name]
            n = seq.n_frames
            images = load_images(name, seq)
            scans = load_scans(name, seq)
            R0, t0 = seq.pose(0)
            gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])

            plain = CamLidarPipeline(vcfg).run_chunked(
                scans, images, chunk=8, ingest="polar"
            )
            coupled = CamLidarPipeline(vcfg).run_chunked(
                scans, images, chunk=8, ingest="polar", coupled=True
            )
            row = {
                "regime": name + "_visual",
                "frames": n,
                "ate_visual_m": round(metrics.ate_rmse(
                    plain.visual_positions, gt, align=False), 4),
                "ate_lidar_plain_m": round(metrics.ate_rmse(
                    plain.lidar_positions, gt, align=False), 4),
                "ate_lidar_coupled_m": round(metrics.ate_rmse(
                    coupled.lidar_positions, gt, align=False), 4),
                "ate_visual_coupled_m": round(metrics.ate_rmse(
                    coupled.visual_positions, gt, align=False), 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.direct:
        # direct-photometric VO rows (≡ Tracker2.cpp:60-81 +
        # WindowOptimizer.cpp:68-148): plain tracking-only vs per-frame
        # window BA, across ALL regimes — mirrors the feature-VO rows above
        import jax.numpy as jnp  # noqa: F811

        from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
            CamLidarPipeline, _map_cam_poses_to_lidar,
        )
        from lidar_visual_odometry_tpu.models.direct_vo import DirectVOChunked
        from lidar_visual_odometry_tpu.ops import camera as cam_ops
        from lidar_visual_odometry_tpu.utils.config import (
            CameraConfig, ExtrinsicConfig, SystemConfig as SC, VisualConfig,
        )

        # bench-scale camera, like the feature-VO rows above (VERDICT r4
        # weak #2) — the direct rows must measure the tracker, not the FOV
        CAM = dict(fx=240.0, fy=240.0, cx=320.0, cy=96.0,
                   width=640, height=192)
        R_sc = np.array(
            [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]
        )
        ext = tuple(tuple(float(v) for v in row) + (0.0,) for row in R_sc.T)
        dcfg = SC(
            camera=CameraConfig(**CAM),
            visual=VisualConfig(depth_cloud_cap=16384),
            extrinsic=ExtrinsicConfig(matrix=ext),
        )

        def load_images(name, seq):
            n = seq.n_frames
            cache = os.path.join(
                here, "..",
                f".eval_imgs_{name}_{CAM['width']}x{CAM['height']}.npz",
            )
            if os.path.exists(cache):
                data = np.load(cache)
                return [data[f"i{k}"] for k in range(n)]
            images = []
            for k in range(n):
                Rc, tc = synthetic.camera_from_velodyne_pose(*seq.pose(k))
                img, _ = synthetic.render_image(seq.scene, Rc, tc, **CAM)
                images.append(img)
            np.savez_compressed(
                cache, **{f"i{k}": im for k, im in enumerate(images)}
            )
            return images

        for name, seq in regimes.items():
            n = seq.n_frames
            scans = load_scans(name, seq)
            images = load_images(name, seq)
            R0, t0 = seq.pose(0)
            gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])

            clp = CamLidarPipeline(dcfg)
            clouds, cmasks = [], []
            for s in scans:
                cf, cm = clp._cam_cloud(np.asarray(s)[:, :3])
                clouds.append(cf)
                cmasks.append(cm)
            cam = cam_ops.Pinhole.from_config(dcfg.camera)

            row = {"regime": name + "_direct", "frames": n}
            for label, run_ba in (("plain", False), ("ba", True)):
                dvo = DirectVOChunked(
                    cam, dcfg.visual, point_cap=2048, run_window_ba=run_ba,
                )
                ts_d, qs_d, _ = dvo.run_chunked(
                    images, clouds, cmasks, chunk=8
                )
                _, vt = _map_cam_poses_to_lidar(
                    jnp.asarray(qs_d), jnp.asarray(ts_d),
                    clp.T_lidar_cam, clp.T_cam_lidar,
                )
                row[f"ate_direct_{label}_m"] = round(
                    metrics.ate_rmse(np.asarray(vt), gt, align=False), 4
                )
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.imu:
        # bumpy trajectory (bounce + roll wobble): synthetic IMU from the
        # analytic GT poses; ImuFusedOdometry must beat plain odometry
        # (adjustPointCloud + BackEndSolver wiring, BackEndSolver.cpp:22-146)
        from lidar_visual_odometry_tpu.data import sync
        from lidar_visual_odometry_tpu.models.imu_fusion import (
            ImuFusedOdometry,
        )

        from lidar_visual_odometry_tpu.utils.config import OdometryConfig

        def run_imu(seq, drv):
            n = seq.n_frames
            stamps, accel, gyro = synthetic.synthesize_imu(
                seq, frame_period=0.1, rate_hz=100.0,
                accel_noise=0.02, gyro_noise=0.002,
            )
            idxs = sync.bundle_imu(np.arange(n) * 0.1, stamps)
            dts = np.full(stamps.shape, 0.01, np.float32)
            fused_pos, odom_pos = [], []
            for k in range(n):
                fp = drv.process(
                    seq.scan(k), accel[idxs[k]], gyro[idxs[k]], dts[idxs[k]]
                )
                fused_pos.append(np.asarray(fp.t))
                odom_pos.append(np.asarray(drv.odom.state.pose_w.t))
            R0, t0 = seq.pose(0)
            gt = np.stack(
                [R0.T @ (seq.pose(k)[1] - t0) for k in range(n)]
            )
            return (
                metrics.ate_rmse(np.stack(odom_pos), gt, align=False),
                metrics.ate_rmse(np.stack(fused_pos), gt, align=False),
            )

        # 1. bumpy smooth drive: window fusion smooths odometry jitter
        bumpy = synthetic.SyntheticSequence(
            n_frames=40, width=W, yaw_rate=0.01, noise=0.02,
            bounce=0.08, roll_amp=0.04,
        )
        ate_o, ate_f = run_imu(bumpy, ImuFusedOdometry(SystemConfig(), window=8))
        row = {
            "regime": "bumpy_imu", "frames": bumpy.n_frames,
            "ate_odom_m": round(ate_o, 4), "ate_imu_fused_m": round(ate_f, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        # 2. sharp constant-speed turn under a REAL-TIME iteration budget
        # (fixed 5 re-association rounds): the gyro warm start puts the turn
        # onset inside the scan-to-scan basin — the measurable IMU win the
        # reference's dormant BackEndSolver was built for. (The turn must be
        # velocity-continuous: the default out_and_back steps its speed
        # 10→4 m/s at segment boundaries, which no physical IMU stream can
        # reproduce — synthesize_imu would rightly disagree there.)
        turn = synthetic.PiecewiseArcSequence(
            width=W, noise=0.01,
            segments=(
                (16, 1.0, 0.0), (12, 1.0, np.pi / 12), (16, 1.0, 0.0)
            ),
        )
        budget = SystemConfig(
            odometry=OdometryConfig(outer_iters=5, outer_tol=0.0)
        )
        ate_plain, _ = run_imu(
            turn, ImuFusedOdometry(budget, window=8, imu_warmstart=False)
        )
        ate_warm, ate_wf = run_imu(
            turn, ImuFusedOdometry(budget, window=8, imu_warmstart=True)
        )
        row = {
            "regime": "const_speed_turn_imu_budget5", "frames": turn.n_frames,
            "ate_odom_no_imu_m": round(ate_plain, 4),
            "ate_odom_imu_warmstart_m": round(ate_warm, 4),
            "ate_imu_fused_m": round(ate_wf, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.sweep_outer:
        # mapping iteration-schedule sweep (reference: 10 outer x 4 GN,
        # laserMapping.cpp:562,715) on the rotation-heavy regime
        import dataclasses

        from lidar_visual_odometry_tpu.utils.config import MappingConfig

        seq = regimes["rotation_heavy"]
        scans = load_scans("rotation_heavy", seq)
        R0, t0 = seq.pose(0)
        gt = np.stack(
            [R0.T @ (seq.pose(k)[1] - t0) for k in range(seq.n_frames)]
        )
        for outer in (1, 2, 4, 10):
            # outer_tol=0 pins FIXED rounds — the sweep justifies the
            # adaptive default by showing where fixed schedules saturate
            cfg = SystemConfig(
                mapping=MappingConfig(outer_iters=outer, outer_tol=0.0)
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
