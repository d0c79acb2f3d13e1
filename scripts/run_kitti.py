#!/usr/bin/env python
"""KITTI odometry sequence runner.

Replaces the reference's roslaunch workflow (kittiHelper → scanRegistration →
laserOdometry → laserMapping → rviz) with one CLI: stream a KITTI sequence
through the TPU pipeline (native async loader → jitted feature/odometry
chunks [→ mapping]), write the trajectory in KITTI format, and print
ATE / t_rel / r_rel against ground truth when available.

Usage:
    python scripts/run_kitti.py --root /data/kitti_odometry --sequence 0
    python scripts/run_kitti.py --root ... --sequence 0 --mapping --max-frames 500
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--sequence", type=int, default=0)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--mapping", action="store_true", help="scan-to-map stage")
    ap.add_argument("--camera", action="store_true",
                    help="fused camera+lidar mode (CamLidarPipeline): feed "
                    "image_0 alongside the scans, report both trajectories "
                    "(≡ kittiHelper.cpp:91-93,153-162 publishing /image_left "
                    "into CamLidarProcess). Combine with --mapping for the "
                    "reference's full topology (visual + odometry + "
                    "scan-to-map in one fused program, "
                    "laserOdometry.cpp:248,308 + laserMapping.cpp:934)")
    ap.add_argument("--coupled", action="store_true",
                    help="tightly-coupled cam-lidar: the visual relative "
                    "pose warm-starts the lidar scan-to-scan GN (the "
                    "reference's dormant CamLidarProcess.cpp:278-307 "
                    "coupling). Implies --camera; composes with --mapping")
    ap.add_argument("--direct", action="store_true",
                    help="direct photometric VO (Tracker2 + per-keyframe "
                    "window BA, the reference's dormant "
                    "Frontend::track_camlidar path) on image_0 + the "
                    "camera-frame lidar cloud; reports the direct "
                    "trajectory alongside the lidar one")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--map-skip", type=int, default=1,
                    help="mapping cadence (≡ mapping_skip_frame; the "
                    "windowed 5-NN makes every-frame mapping affordable)")
    ap.add_argument("--ingest", choices=("float", "uint16", "polar"),
                    default="polar",
                    help="scan upload encoding (polar = 4 B/cell packed "
                    "range image, the fastest transfer path)")
    ap.add_argument("--out", default=None, help="trajectory output path")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="snapshot the full pipeline state every N frames "
                    "(rounded to chunk boundaries) to --checkpoint-path; "
                    "a later --resume continues BIT-EXACTLY (the reference "
                    "loses everything on a crash, SURVEY §5)")
    ap.add_argument("--checkpoint-path", default=None,
                    help="snapshot file (default <out>.ckpt.npz; the "
                    "--direct companion state lands in *_direct.ckpt.npz)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from --checkpoint-path instead of "
                    "starting at frame 0")
    ap.add_argument("--stop-after", type=int, default=None,
                    help="stop after this many frames, right after writing "
                    "a checkpoint (budgeted partial runs; also the "
                    "kill-simulation hook for the resume tests)")
    ap.add_argument("--plot", default=None, help="write a trajectory PNG here")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (env JAX_PLATFORMS is latched too late "
        "in this container — this flag uses jax.config instead)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lidar_visual_odometry_tpu.data.kitti import KittiOdometrySequence
    from lidar_visual_odometry_tpu.data.native_loader import NativeScanReader
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models.pipeline import (
        FullPipeline, OdometryPipeline,
    )
    from lidar_visual_odometry_tpu.utils.config import kitti_config

    seq = KittiOdometrySequence(args.root, args.sequence)
    n = len(seq) if args.max_frames is None else min(len(seq), args.max_frames)
    cfg = kitti_config(args.sequence)

    pattern = os.path.join(seq.seq_dir, "velodyne", "%06ld.bin")
    reader = NativeScanReader(pattern, n_files=n)
    scans = []
    for xyz, mask, _ in reader:
        scans.append(xyz[mask])
    reader.close()

    visual_result = None
    direct_result = None
    mapped_result = None
    if args.coupled or args.direct:
        args.camera = True
    out_path = args.out or f"trajectory_{args.sequence:02d}.txt"
    ckpt_path = args.checkpoint_path or out_path.replace(".txt", "") + \
        ".ckpt.npz"
    ckpt_kw = dict(
        checkpoint_path=ckpt_path if (args.checkpoint_every or args.resume)
        else None,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume, stop_after=args.stop_after,
    )
    t0 = time.time()
    if args.camera:
        import dataclasses

        from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
            CamLidarPipeline,
        )
        from lidar_visual_odometry_tpu.utils.config import ExtrinsicConfig

        # per-sequence extrinsic from the dataset's own calib.txt (Tr:
        # velodyne→cam0) instead of the seq-00 default
        cfg = dataclasses.replace(
            cfg, extrinsic=ExtrinsicConfig(
                matrix=tuple(map(tuple, seq.Tr.astype(float)))
            ),
        )
        H, W = cfg.camera.height, cfg.camera.width
        images = []
        for k in range(n):
            im = seq.image(k)
            # edge-replicate pad to the static camera shape (KITTI grays are
            # 1241×376 etc.; cfg pads to 1280×384 — intrinsics unchanged,
            # principal point stays valid for bottom/right padding)
            ph, pw = max(0, H - im.shape[0]), max(0, W - im.shape[1])
            images.append(np.pad(im[:H, :W], ((0, ph), (0, pw)), mode="edge"))
        pipe = CamLidarPipeline(cfg)
        ingest = args.ingest
        if (args.coupled or args.mapping) and not ingest.startswith("polar"):
            ingest = "polar"  # the fused coupled/SLAM chunks decode polar
        res = pipe.run_chunked(
            scans, images, chunk=args.chunk, progress=True, ingest=ingest,
            coupled=args.coupled, mapping=args.mapping,
            map_skip=args.map_skip, **ckpt_kw,
        )
        from lidar_visual_odometry_tpu.models.pipeline import TrajectoryResult

        if args.mapping:
            mapped_result = TrajectoryResult(
                res.mapped_positions, res.mapped_quats
            )
            result = mapped_result
        else:
            result = TrajectoryResult(res.lidar_positions, res.lidar_quats)
        visual_result = res

        if args.direct:
            import jax.numpy as jnp

            from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
                _map_cam_poses_to_lidar,
            )
            from lidar_visual_odometry_tpu.models.direct_vo import (
                DirectVOChunked,
            )
            from lidar_visual_odometry_tpu.ops import camera as cam_ops

            clouds, cmasks = [], []
            for s in scans:
                cf, cm = pipe._cam_cloud(np.asarray(s)[:, :3])
                clouds.append(cf)
                cmasks.append(cm)
            cam = cam_ops.Pinhole.from_config(cfg.camera)
            dvo = DirectVOChunked(cam, cfg.visual, point_cap=2048)
            dkw = dict(ckpt_kw)
            if dkw["checkpoint_path"]:
                # derive the direct-VO companion path robustly: a custom
                # --checkpoint-path may not end in .ckpt.npz, and a no-op
                # replace would make BOTH pipelines write the same file
                # (the direct save would clobber the cam-lidar snapshot)
                import re

                p = dkw["checkpoint_path"]
                p2 = re.sub(r"(\.ckpt\.npz|\.npz)$", r"_direct\1", p)
                dkw["checkpoint_path"] = (
                    p2 if p2 != p else p + "_direct.npz"
                )
            ts_d, qs_d, _ = dvo.run_chunked(
                images, clouds, cmasks, chunk=args.chunk, **dkw
            )
            dq, dt = _map_cam_poses_to_lidar(
                jnp.asarray(qs_d), jnp.asarray(ts_d),
                pipe.T_lidar_cam, pipe.T_cam_lidar,
            )
            direct_result = TrajectoryResult(
                np.asarray(dt), np.asarray(dq)
            )
    elif args.mapping:
        pipe = FullPipeline(cfg)
        odom, mapped = pipe.run_chunked(
            scans, chunk=args.chunk, progress=True,
            map_skip=args.map_skip, ingest=args.ingest, **ckpt_kw,
        )
        result = mapped
    else:
        pipe = OdometryPipeline(cfg)
        result = pipe.run_chunked(
            scans, chunk=args.chunk, progress=True, ingest=args.ingest,
            **ckpt_kw,
        )
    wall = time.time() - t0

    # a --stop-after run returns a truncated trajectory; report on what ran
    n = min(n, len(result.positions))
    from lidar_visual_odometry_tpu.eval.metrics import poses_to_matrices

    mats = poses_to_matrices(result.quaternions, result.positions)
    with open(out_path, "w") as f:
        for T in mats:
            f.write(" ".join(f"{v:.6e}" for v in T[:3].reshape(-1)) + "\n")
    def write_traj(path, quats, positions):
        m = poses_to_matrices(quats, positions)
        with open(path, "w") as f:
            for T in m:
                f.write(
                    " ".join(f"{v:.6e}" for v in T[:3].reshape(-1)) + "\n"
                )

    if visual_result is not None:
        write_traj(
            out_path.replace(".txt", "_visual.txt"),
            visual_result.visual_quats, visual_result.visual_positions,
        )
    if direct_result is not None:
        write_traj(
            out_path.replace(".txt", "_direct.txt"),
            direct_result.quaternions, direct_result.positions,
        )
    if args.camera and args.mapping and visual_result is not None:
        # in the combined topology `result` holds the mapped trajectory;
        # also write the raw odometry one for per-mode metrics
        write_traj(
            out_path.replace(".txt", "_odom.txt"),
            visual_result.lidar_quats, visual_result.lidar_positions,
        )

    # a resumed run only COMPUTED the tail — fps over the full trajectory
    # length would fabricate throughput (the prefix cost nothing this run)
    processed = n - 1
    if args.resume and os.path.exists(ckpt_path):
        start = int(np.load(ckpt_path)["frame_idx"])
        processed = max(n - start, 1)
    report = {
        "sequence": args.sequence,
        "frames": n,
        "fps": round(processed / wall, 2),
        "mode": ("coupled" if args.coupled else
                 "camera" if args.camera else
                 "mapping" if args.mapping else "odometry")
                + ("+mapping" if args.camera and args.mapping else "")
                + ("+direct" if args.direct else ""),
    }
    if seq.gt_poses is not None:
        gt = np.stack([seq.gt_pose_velodyne(k) for k in range(n)])
        # express GT relative to the first velodyne pose (estimate frame)
        gt_rel = np.linalg.inv(gt[0])[None] @ gt
        report["ate_rmse_m"] = round(
            metrics.ate_rmse(result.positions, gt_rel[:, :3, 3]), 4
        )
        t_rel, r_rel = metrics.kitti_relative_errors(mats, gt_rel)
        report["t_rel_pct"] = round(t_rel, 3)
        report["r_rel_deg_per_100m"] = round(r_rel, 4)
        if visual_result is not None:
            report["ate_visual_m"] = round(
                metrics.ate_rmse(
                    visual_result.visual_positions, gt_rel[:, :3, 3]
                ), 4,
            )
        if args.camera and args.mapping:
            report["ate_odom_m"] = round(
                metrics.ate_rmse(
                    visual_result.lidar_positions, gt_rel[:, :3, 3]
                ), 4,
            )
        if direct_result is not None:
            report["ate_direct_m"] = round(
                metrics.ate_rmse(
                    direct_result.positions, gt_rel[:, :3, 3]
                ), 4,
            )
        if args.plot:
            from lidar_visual_odometry_tpu.eval.plot import plot_trajectory

            plot_trajectory(
                result.positions, gt_rel[:, :3, 3], args.plot,
                title=f"KITTI {args.sequence:02d}",
            )
            report["plot"] = args.plot
    print(json.dumps(report))


if __name__ == "__main__":
    main()
