#!/usr/bin/env python
"""Long-horizon fused-SLAM stress (VERDICT r3 item 8).

A 500+-frame multi-lap drive through the corridor (each lap revisits the
same ground, with two 180-degree U-turns) through the fused SLAM path
(mapping EVERY frame, polar2 ingest):

* map-cap eviction behavior across multiple revisits (occupancy at caps),
* steady-state fps EXCLUDING the frame-0 bootstrap + first-chunk compile,
* a mid-run checkpoint/resume that must reproduce the uninterrupted
  trajectory bit-exactly.

Usage:
    python scripts/stress_long.py [--laps 4] [--leg 50] [--cpu]
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
    ap.add_argument("--laps", type=int, default=4)
    ap.add_argument("--leg", type=int, default=50)
    ap.add_argument("--turn", type=int, default=14)
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-resume-check", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.data.native_pack import pack_polar_chunk
    from lidar_visual_odometry_tpu.eval import metrics
    from lidar_visual_odometry_tpu.models import device_mapping as dm
    from lidar_visual_odometry_tpu.models import lidar_odometry as lo
    from lidar_visual_odometry_tpu.models import scan_registration as sr
    from lidar_visual_odometry_tpu.ops import pointcloud as pc
    from lidar_visual_odometry_tpu.ops import se3
    from lidar_visual_odometry_tpu.utils.config import SystemConfig

    # multi-lap out-and-back: leg → U-turn → leg → U-turn, x laps.
    # Every lap re-traverses the same corridor segment — the map's bounded
    # eviction must keep revisited geometry useful lap after lap.
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
    cache = os.path.join(
        here, "..",
        f".stress_scans_{args.laps}x{args.leg}_{args.turn}_{args.width}.npz",
    )
    if os.path.exists(cache):
        data = np.load(cache)
        scans = [data[f"s{k}"] for k in range(n)]
    else:
        t0 = time.time()
        scans = [seq.scan(k) for k in range(n)]
        print(f"rendered {n} scans in {time.time() - t0:.0f}s", flush=True)
        np.savez_compressed(cache, **{f"s{k}": s for k, s in enumerate(scans)})

    cfg = SystemConfig()
    lcfg = cfg.lidar

    def run(start_chunk=0, odo_state=None, map_state=None, n_chunks=None,
            sync_after_first=False):
        """Run chunks [start_chunk, start_chunk+n_chunks) of the sequence;
        returns (odo_state, map_state, odom poses, mapped poses, chunk wall
        times). Frame 0 bootstraps when starting from scratch."""
        if odo_state is None:
            xyz0, mask0 = pc.pad_points(
                np.asarray(scans[0])[:, :3], 131072
            )
            reg0 = sr.register_scan(
                jnp.asarray(xyz0), jnp.asarray(mask0), lcfg
            )
            odo_state = lo.init_state(reg0.features)
            map_state = dm.init_state(cfg.mapping)
        starts = list(range(1, n, args.chunk))
        sel = starts[start_chunk:
                     None if n_chunks is None else start_chunk + n_chunks]
        oq, ot, mq, mt, walls = [], [], [], [], []
        for s in sel:
            t0 = time.time()
            batch = scans[s:s + args.chunk]
            imgs = pack_polar_chunk(
                batch, n_scans=lcfg.n_scans, width=lcfg.azimuth_bins,
                min_range=lcfg.min_range, max_range=lcfg.max_range,
                n_frames=args.chunk, channels=1,
            )
            odo_state, map_state, op, mp = dm.slam_chunk_polar(
                odo_state, map_state, jnp.asarray(imgs),
                lcfg, cfg.odometry, cfg.mapping,
                start_idx=s, map_skip=1,
            )
            oq.append(op.q)
            ot.append(op.t)
            mq.append(mp.q)
            mt.append(mp.t)
            # per-chunk wall includes async dispatch only; force one sync
            # at the end for true totals — record dispatch walls anyway
            if sync_after_first and s == sel[0]:
                # drain chunk 0's COMPUTE (not just its dispatch) so the
                # steady-state window that excludes walls[0] is a strict
                # exclusion (ADVICE r4: dispatch-only walls[0] overlapped
                # later chunks and made steady_fps slightly optimistic)
                np.asarray(mp.t)
            walls.append(time.time() - t0)
        # drain + fetch
        cat = jax.jit(lambda xs: jnp.concatenate(xs))
        out = [np.asarray(cat(x)) for x in (oq, ot, mq, mt)]
        return odo_state, map_state, out, walls

    # ---- uninterrupted run with stage timing ----
    t_all0 = time.time()
    odo1, map1, (oq, ot, mq, mt), _ = run()
    wall_total = time.time() - t_all0

    # steady-state: rerun (states warm, programs compiled), time all
    # chunks after the first — excludes compile + frame-0 bootstrap
    t1 = time.time()
    _, _, _, walls = run(sync_after_first=True)
    wall_warm = time.time() - t1
    frames_warm = n - 1 - args.chunk
    steady_fps = frames_warm / max(wall_warm - walls[0], 1e-9)

    R0, t0v = seq.pose(0)
    gt = np.stack([R0.T @ (seq.pose(k)[1] - t0v) for k in range(n)])
    mapped_pos = np.concatenate([np.zeros((1, 3), np.float32), mt])[:n]
    odom_pos = np.concatenate([np.zeros((1, 3), np.float32), ot])[:n]
    ate_map = metrics.ate_rmse(mapped_pos, gt, align=False)
    ate_odo = metrics.ate_rmse(odom_pos, gt, align=False)

    gt_q = np.stack([
        np.asarray(se3.matrix_to_quat(
            jnp.asarray(R0.T @ seq.pose(k)[0], dtype=jnp.float32)))
        for k in range(n)
    ])
    mapped_q = np.concatenate(
        [np.array([[1.0, 0, 0, 0]], np.float32), mq])[:n]
    t_rel, r_rel = metrics.kitti_relative_errors(
        metrics.poses_to_matrices(mapped_q, mapped_pos),
        metrics.poses_to_matrices(gt_q, gt), step=4,
    )

    occ_corner = float(np.asarray(map1.corner_mask).sum()) / (
        cfg.mapping.map_corner_cap
    )
    occ_surf = float(np.asarray(map1.surf_mask).sum()) / (
        cfg.mapping.map_surf_cap
    )

    report = {
        "frames": n,
        "laps": args.laps,
        "ate_odom_m": round(float(ate_odo), 4),
        "ate_mapped_m": round(float(ate_map), 4),
        "t_rel_pct": round(float(t_rel), 3),
        "r_rel_deg_per_100m": round(float(r_rel), 4),
        "fps_total_cold": round((n - 1) / wall_total, 2),
        "fps_steady": round(steady_fps, 2),
        "map_occupancy_corner": round(occ_corner, 3),
        "map_occupancy_surf": round(occ_surf, 3),
    }

    if not args.no_resume_check:
        # ---- mid-run checkpoint/resume: save at half, resume into fresh
        # arrays, run the second half, compare against uninterrupted ----
        starts = list(range(1, n, args.chunk))
        half = len(starts) // 2
        odo_h, map_h, (oq_h, ot_h, mq_h, mt_h), _ = run(n_chunks=half)

        ckpt = {}
        for i, leaf in enumerate(jax.tree.leaves((odo_h, map_h))):
            ckpt[f"l{i}"] = np.asarray(leaf)
        np.savez(os.path.join(here, "..", ".stress_ckpt.npz"), **ckpt)
        data = np.load(os.path.join(here, "..", ".stress_ckpt.npz"))
        leaves, treedef = jax.tree.flatten((odo_h, map_h))
        restored = jax.tree.unflatten(
            treedef, [jnp.asarray(data[f"l{i}"]) for i in range(len(leaves))]
        )
        odo_r, map_r = restored
        _, _, (oq2, ot2, mq2, mt2), _ = run(
            start_chunk=half, odo_state=odo_r, map_state=map_r,
        )
        resumed = np.concatenate([mt_h, mt2])
        uninterrupted = mt
        bit_exact = bool(
            np.array_equal(resumed[: len(uninterrupted)], uninterrupted)
        )
        report["resume_bit_exact"] = bit_exact
        report["resume_max_diff"] = float(
            np.abs(resumed[: len(uninterrupted)] - uninterrupted).max()
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
