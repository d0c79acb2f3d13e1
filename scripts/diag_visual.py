"""Diagnose the feature-VO drift on the bench corridor (VERDICT r3 item 1).

Runs the feature-VO frontend per frame on CPU with instrumentation, in four
passes that swap estimated quantities for ground truth (the synthetic scene
gives exact depth maps and poses):

  base     — the shipping pipeline (LK flow + lidar depth association)
  gt_depth — feature depths replaced by the rendered GT depth map
  gt_flow  — LK tracks replaced by exact GT reprojections
  gt_both  — both

Whichever substitution collapses the ATE names the dominant error source.
Per-frame stats: tracked/lidar-depth/triangulated row counts, depth error vs
GT, relative-pose error split into forward/lateral translation and rotation.

Usage: python scripts/diag_visual.py [--frames N] [--passes base,gt_depth,...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from lidar_visual_odometry_tpu.data import synthetic  # noqa: E402
from lidar_visual_odometry_tpu.eval import metrics  # noqa: E402
from lidar_visual_odometry_tpu.models import visual_frontend as vf  # noqa: E402
from lidar_visual_odometry_tpu.ops import camera as cam_ops  # noqa: E402
from lidar_visual_odometry_tpu.ops import image, lk, se3  # noqa: E402

import bench  # noqa: E402  (repo root on path via sys.path insert)


def gt_camera_poses(seq, n):
    """R_wc, t_wc per frame (camera→world)."""
    Rs, ts = [], []
    for k in range(n):
        Rc, tc = synthetic.camera_from_velodyne_pose(*seq.pose(k))
        Rs.append(Rc)
        ts.append(tc)
    return Rs, ts


def sample_depth(depth_map, uv):
    """Nearest-neighbor GT depth at pixel coords uv (N, 2); <=0 invalid."""
    H, W = depth_map.shape
    x = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    y = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    d = depth_map[y, x]
    return np.where(np.isfinite(d) & (d > 0), d, -1.0)


def run_pass(mode, scans, images, depths, seq, cfg, cam, n, verbose=True):
    from lidar_visual_odometry_tpu.models.cam_lidar_pipeline import (
        CamLidarPipeline,
    )

    vcfg = cfg.visual
    clp = CamLidarPipeline(cfg)
    Rs, ts = gt_camera_poses(seq, n)

    table = vf.empty_table(vcfg.max_tracked)
    pose_w = se3.identity_pose()
    warm_rel = se3.identity_pose()
    prev_pyr = None
    prev_dc = None
    traj_t = [np.zeros(3)]
    stats = []

    for k in range(n):
        img = jnp.asarray(np.asarray(images[k], np.float32))
        pyr = tuple(image.build_pyramid(img, vcfg.lk_levels))
        cxyz, cmask = clp._cam_cloud(np.asarray(scans[k])[:, :3])
        dc = vf.build_depth_cloud(jnp.asarray(cxyz), jnp.asarray(cmask))
        if prev_pyr is None:
            table = vf._replenish_jit(table, pyr[0], cam, pose_w, vcfg)
            prev_pyr, prev_dc = pyr, dc
            continue

        # GT relative camera pose prev->cur: T_cur_prev
        R_rel = Rs[k].T @ Rs[k - 1]
        t_rel = Rs[k].T @ (ts[k - 1] - ts[k])

        uv1, ok = lk.track_pyramid_reverse_checked(
            prev_pyr, pyr, table.uv, table.active, table.flow,
            win=vcfg.lk_window, iters=vcfg.lk_iters, levels=vcfg.lk_levels,
            max_reverse_err=vcfg.reverse_check_px,
            reverse_levels=vcfg.lk_reverse_levels or None,
            iters_coarse=vcfg.lk_iters_coarse or None,
            eps=vcfg.lk_eps,
            affine=vcfg.lk_affine,
        )
        uv1 = np.asarray(uv1)
        ok = np.asarray(ok)
        uv0 = np.asarray(table.uv)
        active = np.asarray(table.active) & ok

        # GT depth at prev-frame feature pixels + exact reprojection
        d_gt = sample_depth(depths[k - 1], uv0)
        un0_np = np.stack(
            [(uv0[:, 0] - float(cam.cx)) / float(cam.fx),
             (uv0[:, 1] - float(cam.cy)) / float(cam.fy)], -1
        )
        p0_gt = np.concatenate(
            [un0_np, np.ones_like(un0_np[:, :1])], -1
        ) * d_gt[:, None]
        p1_gt = p0_gt @ R_rel.T + t_rel
        z1 = np.maximum(p1_gt[:, 2], 1e-6)
        uv1_gt = np.stack(
            [p1_gt[:, 0] / z1 * float(cam.fx) + float(cam.cx),
             p1_gt[:, 1] / z1 * float(cam.fy) + float(cam.cy)], -1
        )
        gt_ok = (d_gt > 0) & (p1_gt[:, 2] > 0.3)

        if mode in ("gt_flow", "gt_both"):
            use = gt_ok & np.asarray(table.active)
            uv1 = np.where(use[:, None], uv1_gt, uv1)
            ok = ok | use
            active = np.asarray(table.active) & ok

        # flow error among survivors with GT depth (diagnostic)
        fe_vec = uv1 - uv1_gt
        fe = np.linalg.norm(fe_vec, axis=-1)
        fe_valid = active & gt_ok
        # radial decomposition about the FOE (≈ principal point under
        # forward motion): positive = feature tracked OUTWARD past GT
        rad_dir = uv0 - np.array([float(cam.cx), float(cam.cy)])
        rad_n = rad_dir / np.maximum(
            np.linalg.norm(rad_dir, axis=-1, keepdims=True), 1e-6
        )
        fe_rad = np.sum(fe_vec * rad_n, axis=-1)

        # ---- replicate solve_and_update with instrumentation ----
        un0 = cam_ops.normalized(cam, jnp.asarray(uv0))
        un1 = cam_ops.normalized(cam, jnp.asarray(uv1))
        d_lidar, ok_lidar = vf.associate_depth(
            un0, jnp.asarray(active), prev_dc
        )
        T_first = se3.Pose(table.start_q, table.start_t)
        T_prev_first = se3.se3_compose(
            se3.se3_inverse(se3.Pose(
                jnp.broadcast_to(pose_w.q, table.start_q.shape),
                jnp.broadcast_to(pose_w.t, table.start_t.shape),
            )),
            T_first,
        )
        d_tri, ok_tri = vf.triangulate(un0, table.start_un, T_prev_first)
        d_lidar = np.asarray(d_lidar)
        ok_lidar = np.asarray(ok_lidar)
        d_tri = np.asarray(d_tri)
        ok_tri = np.asarray(ok_tri)
        prev_d = np.asarray(table.depth)
        has_prev = prev_d > 0

        d_tri_fused = np.where(has_prev, 0.4 * prev_d + 0.6 * d_tri, d_tri)
        depth = np.where(
            ok_lidar, d_lidar,
            np.where(ok_tri, d_tri_fused, np.where(has_prev, prev_d, 0.0)),
        )
        v1 = ok_lidar
        v2 = ~ok_lidar & (ok_tri | has_prev)
        has_depth = (v1 | v2) & active & (depth > 0)
        epi_ok = (~v1) & active

        if mode in ("gt_depth", "gt_both"):
            take = gt_ok & active
            depth = np.where(take, d_gt, depth)
            has_depth = take | (has_depth & ~take)

        # depth error stats (lidar-associated rows with GT available)
        de_mask = ok_lidar & gt_ok & active
        de = np.abs(d_lidar - d_gt)[de_mask] if de_mask.any() else np.array([0.0])

        rel = vf.solve_pose(
            warm_rel, un0, un1, jnp.asarray(depth),
            jnp.asarray(has_depth), jnp.asarray(epi_ok), vcfg,
        )

        # relative-pose error vs GT
        q_est = np.asarray(rel.q)
        t_est = np.asarray(rel.t)
        # rotation error angle
        R_est = np.asarray(se3.quat_to_matrix(rel.q))
        dR = R_est.T @ R_rel
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = t_est - t_rel
        # camera frame: z forward, x right, y down
        stats.append(dict(
            k=k, n_trk=int(active.sum()), n_lidar=int(ok_lidar.sum()),
            n_tri=int((ok_tri & active & ~ok_lidar).sum()),
            n_depth=int(has_depth.sum()), n_epi=int(epi_ok.sum()),
            de_med=float(np.median(de)),
            fe_med=float(np.median(fe[fe_valid])) if fe_valid.any() else -1,
            fe_mean_x=float(fe_vec[fe_valid, 0].mean()) if fe_valid.any() else 0,
            fe_mean_y=float(fe_vec[fe_valid, 1].mean()) if fe_valid.any() else 0,
            fe_rad_mean=float(fe_rad[fe_valid].mean()) if fe_valid.any() else 0,
            # flow error vs GT depth: near features zoom more under forward
            # motion — a positive correlation fingers scale-change bias
            fe_depth_corr=float(np.corrcoef(
                fe[fe_valid], d_gt[fe_valid]
            )[0, 1]) if fe_valid.sum() > 3 else 0,
            dt_fwd=float(dt[2]), dt_lat=float(dt[0]), dt_vert=float(dt[1]),
            rot_err_deg=float(ang),
            scale=float(np.linalg.norm(t_est) / max(np.linalg.norm(t_rel), 1e-9)),
        ))

        # propagate
        new_pose_w = se3.se3_compose(pose_w, se3.se3_inverse(rel))
        p0 = (
            jnp.concatenate([un0, jnp.ones_like(un0[:, :1])], axis=-1)
            * jnp.asarray(depth)[:, None]
        )
        p1 = se3.quat_rotate(rel.q[None], p0) + rel.t
        new_depth = jnp.where(jnp.asarray(has_depth), p1[:, 2], -1.0)
        table = vf.FeatureTable(
            uv=jnp.asarray(uv1), active=jnp.asarray(active),
            depth=new_depth,
            start_un=table.start_un, start_q=table.start_q,
            start_t=table.start_t, age=table.age + 1,
            flow=jnp.where(jnp.asarray(active)[:, None],
                           jnp.asarray(uv1) - table.uv, 0.0),
        )
        pose_w = new_pose_w
        warm_rel = rel
        table = vf._replenish_jit(table, pyr[0], cam, pose_w, vcfg)
        prev_pyr, prev_dc = pyr, dc
        traj_t.append(np.asarray(pose_w.t))

        if verbose:
            s = stats[-1]
            print(f"[{mode}] k={k:2d} trk={s['n_trk']:4d} lidar={s['n_lidar']:4d} "
                  f"tri={s['n_tri']:3d} depth={s['n_depth']:4d} epi={s['n_epi']:4d} "
                  f"de_med={s['de_med']:.3f} fe_med={s['fe_med']:.3f}px "
                  f"fe_bias=({s['fe_mean_x']:+.3f},{s['fe_mean_y']:+.3f}) "
                  f"fe_rad={s['fe_rad_mean']:+.3f} dcorr={s['fe_depth_corr']:+.2f} "
                  f"dt=({s['dt_fwd']:+.4f},{s['dt_lat']:+.4f},{s['dt_vert']:+.4f}) "
                  f"rot={s['rot_err_deg']:.4f}deg scale={s['scale']:.4f}")

    # ATE of the camera trajectory vs GT (camera-0 frame, unaligned —
    # same protocol as bench.py's ate_visual)
    est = np.stack(traj_t)
    R0, t0 = Rs[0], ts[0]
    gt_cam = np.stack([R0.T @ (ts[k] - t0) for k in range(n)])
    ate = metrics.ate_rmse(est, gt_cam, align=False)
    print(f"== pass {mode}: ATE (camera frame, unaligned) = {ate:.4f} m ==")
    return ate, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=bench.N_FRAMES)
    ap.add_argument("--passes", default="base,gt_depth,gt_flow,gt_both")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--no-affine", action="store_true",
                    help="translation-only LK (the pre-fix tracker)")
    args = ap.parse_args()
    n = args.frames

    seq = synthetic.SyntheticSequence(
        n_frames=bench.N_FRAMES, width=1800, speed=1.0, yaw_rate=0.004,
        noise=0.01,
    )
    scans, images = bench._load_or_render(seq)
    scans, images = scans[:n], images[:n]
    cfg = bench._config()
    if args.no_affine:
        import dataclasses

        cfg = cfg.replace(
            visual=dataclasses.replace(cfg.visual, lk_affine=False)
        )
    cam = cam_ops.Pinhole.from_config(cfg.camera)

    # GT depth maps for the camera poses
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dcache = os.path.join(here, ".bench_depths49.npz")
    if os.path.exists(dcache):
        dd = np.load(dcache)
        depths = [dd[f"d{k}"] for k in range(bench.N_FRAMES)][:n]
    else:
        depths = []
        for k in range(bench.N_FRAMES):
            Rc, tc = synthetic.camera_from_velodyne_pose(*seq.pose(k))
            _, d = synthetic.render_image(seq.scene, Rc, tc, **bench.CAM)
            depths.append(d)
        np.savez_compressed(
            dcache, **{f"d{k}": d for k, d in enumerate(depths)}
        )
        depths = depths[:n]

    results = {}
    for mode in args.passes.split(","):
        results[mode], _ = run_pass(
            mode, scans, images, depths, seq, cfg, cam, n,
            verbose=not args.quiet,
        )
    print("\n==== summary ====")
    for m, a in results.items():
        print(f"  {m:10s} ATE = {a:.4f} m")


if __name__ == "__main__":
    main()
