"""Visual frontend tests: depth association, triangulation, pose GN, and a
two-frame end-to-end visual odometry run on photo-consistent renders."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import visual_frontend as vf
from lidar_visual_odometry_tpu.ops import camera, se3
from lidar_visual_odometry_tpu.utils.config import VisualConfig

CAM = dict(fx=120.0, fy=120.0, cx=160.0, cy=48.0, width=320, height=96)


def make_cam():
    return camera.Pinhole(
        jnp.float32(CAM["fx"]), jnp.float32(CAM["fy"]),
        jnp.float32(CAM["cx"]), jnp.float32(CAM["cy"]),
        CAM["width"], CAM["height"], jnp.zeros(5),
    )


class TestDepthAssoc:
    def test_recovers_plane_depth(self, rng):
        # depth cloud on the z=5 fronto-parallel plane
        xy = rng.uniform(-2, 2, size=(512, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((512, 1), 5.0, np.float32)], axis=1)
        dc = vf.build_depth_cloud(jnp.asarray(pts), jnp.ones(512, bool))
        un = jnp.asarray(rng.uniform(-0.3, 0.3, size=(32, 2)).astype(np.float32))
        d, ok = vf.associate_depth(un, jnp.ones(32, bool), dc)
        assert np.asarray(ok).mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(d)[np.asarray(ok)], 5.0, atol=0.05
        )

    def test_rejects_depth_discontinuity(self):
        # 3 NN spanning a >2 m depth jump must be rejected
        pts = np.array(
            [[0.0, 0.0, 5.0], [0.05, 0.0, 5.0], [0.0, 0.05, 9.0]], np.float32
        )
        dc = vf.build_depth_cloud(jnp.asarray(pts), jnp.ones(3, bool))
        d, ok = vf.associate_depth(
            jnp.asarray([[0.0, 0.0]]), jnp.ones(1, bool), dc
        )
        assert not bool(ok[0])


class TestTriangulate:
    def test_known_depth(self):
        # point at (0.5, 0.2, 8) in prev frame; first obs from 2 m to the left
        p_prev = np.array([0.5, 0.2, 8.0], np.float32)
        T_pf = se3.Pose(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            jnp.asarray([2.0, 0.0, 0.0], jnp.float32),
        )  # first → prev: x_prev = x_first + (2,0,0)
        p_first = p_prev - np.array([2.0, 0.0, 0.0], np.float32)
        un0 = jnp.asarray([p_prev[:2] / p_prev[2]])
        start_un = jnp.asarray([p_first[:2] / p_first[2]])
        d, ok = vf.triangulate(un0, start_un, se3.Pose(T_pf.q[None], T_pf.t[None]))
        assert bool(ok[0])
        np.testing.assert_allclose(float(d[0]), 8.0, rtol=1e-3)


class TestSolvePose:
    def test_recovers_motion_with_depth(self, rng):
        """Synthetic correspondences with exact depths: GN must recover the
        known T_cur_prev."""
        true_rel = se3.se3_exp(
            jnp.asarray([0.15, -0.08, 0.3, 0.01, -0.02, 0.015], jnp.float32)
        )
        n = 256
        pts_prev = np.stack(
            [
                rng.uniform(-4, 4, n),
                rng.uniform(-2, 2, n),
                rng.uniform(4, 20, n),
            ],
            axis=-1,
        ).astype(np.float32)
        p_cur = np.asarray(se3.se3_apply(true_rel, jnp.asarray(pts_prev)))
        un0 = jnp.asarray(pts_prev[:, :2] / pts_prev[:, 2:])
        un1 = jnp.asarray(p_cur[:, :2] / p_cur[:, 2:])
        depth = jnp.asarray(pts_prev[:, 2])
        cfg = VisualConfig(gn_iters=50)
        est = vf.solve_pose(
            se3.identity_pose(), un0, un1, depth,
            jnp.ones(n, bool), jnp.zeros(n, bool), cfg,
        )
        err = se3.se3_log(se3.se3_compose(se3.se3_inverse(true_rel), est))
        assert float(jnp.abs(err).max()) < 1e-3, np.asarray(err)

    def test_staged_rejection_gates_outliers(self, rng):
        """The iter≥70 outlier-rejection stage (Frontend.cpp:690-693) must
        measurably improve the pose on contaminated correspondences: the
        same problem solved with a schedule that never reaches the stage
        (gn_iters=69 — the round-1 dead-gate configuration) stays biased."""
        true_rel = se3.se3_exp(
            jnp.asarray([0.12, -0.05, 0.25, 0.008, -0.015, 0.01], jnp.float32)
        )
        n = 512  # > 300 so the n_depth gate arm doesn't bypass rejection
        pts_prev = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
             rng.uniform(4, 20, n)], axis=-1,
        ).astype(np.float32)
        p_cur = np.asarray(se3.se3_apply(true_rel, jnp.asarray(pts_prev)))
        un0 = pts_prev[:, :2] / pts_prev[:, 2:]
        un1 = p_cur[:, :2] / p_cur[:, 2:]
        # 20% gross outliers: bogus matches displaced ~0.05 on the
        # normalized plane (≈ 35 px at KITTI focal length)
        bad = rng.random(n) < 0.2
        un1 = un1 + bad[:, None] * rng.normal(0, 0.05, (n, 2))
        un0, un1 = jnp.asarray(un0), jnp.asarray(un1.astype(np.float32))
        depth = jnp.asarray(pts_prev[:, 2])
        ones, zeros = jnp.ones(n, bool), jnp.zeros(n, bool)

        def err_of(est):
            e = se3.se3_log(se3.se3_compose(se3.se3_inverse(true_rel), est))
            return float(jnp.abs(e).max())

        gated = err_of(vf.solve_pose(
            se3.identity_pose(), un0, un1, depth, ones, zeros,
            VisualConfig(gn_iters=150, gn_tol=0.0),
        ))
        ungated = err_of(vf.solve_pose(
            se3.identity_pose(), un0, un1, depth, ones, zeros,
            VisualConfig(gn_iters=69, gn_tol=0.0),
        ))
        assert gated < 0.5 * ungated, (gated, ungated)
        assert gated < 5e-3, gated


class TestVisualOdometryEndToEnd:
    def test_two_frame_motion(self):
        scene = synthetic.BoxScene.corridor(0)
        cam = make_cam()
        cfg = VisualConfig(
            gn_iters=50, lk_levels=3, lk_window=15,
            grid_rows=3, grid_cols=8, max_tracked=256, max_features_per_cell=5,
            depth_cloud_cap=8192,
        )
        vo = vf.VisualOdometry(cam, cfg)

        rng = np.random.default_rng(0)
        poses = []
        for k in range(3):
            R, t = synthetic.camera_from_velodyne_pose(
                synthetic.yaw_matrix(0.004 * k),
                np.array([0.4 * k, 0.0, 1.5]),
            )
            poses.append((R, t))
            img, depth = synthetic.render_image(scene, R, t, **CAM)
            # lidar depth cloud: subsample the rendered depth map
            ys = rng.integers(0, CAM["height"], 4096)
            xs = rng.integers(0, CAM["width"], 4096)
            z = depth[ys, xs]
            okm = np.isfinite(z)
            z = np.where(okm, z, 0.0)
            pts_cam = np.stack(
                [
                    (xs - CAM["cx"]) / CAM["fx"] * z,
                    (ys - CAM["cy"]) / CAM["fy"] * z,
                    z,
                ],
                axis=-1,
            ).astype(np.float32)
            pts_cam[~okm] = 0.0
            pose_w = vo.process(
                jnp.asarray(img), jnp.asarray(pts_cam), jnp.asarray(okm)
            )

        # estimated world pose of frame 2 (in frame-0 camera coords)
        R0, t0 = poses[0]
        R2, t2 = poses[2]
        t_gt = R0.T @ (t2 - t0)
        t_est = np.asarray(pose_w.t)
        err = np.linalg.norm(t_est - t_gt)
        assert err < 0.08, (t_est, t_gt)


class TestVisualChunk:
    def test_fused_chunk_matches_per_frame_path(self):
        """visual_chunk (K frames in one lax.scan program) must reproduce the
        per-frame visual_step driver's poses exactly — same math, one
        dispatch per chunk instead of three per frame."""
        scene = synthetic.BoxScene.corridor(0)
        cam = make_cam()
        cfg = VisualConfig(
            gn_iters=40, lk_levels=3, lk_window=15,
            grid_rows=3, grid_cols=8, max_tracked=256,
            max_features_per_cell=5, depth_cloud_cap=8192,
        )
        rng = np.random.default_rng(0)

        imgs, clouds, masks = [], [], []
        for k in range(4):
            R, t = synthetic.camera_from_velodyne_pose(
                synthetic.yaw_matrix(0.004 * k),
                np.array([0.4 * k, 0.0, 1.5]),
            )
            img, depth = synthetic.render_image(scene, R, t, **CAM)
            ys = rng.integers(0, CAM["height"], 4096)
            xs = rng.integers(0, CAM["width"], 4096)
            z = depth[ys, xs]
            okm = np.isfinite(z)
            z = np.where(okm, z, 0.0)
            pts_cam = np.stack(
                [(xs - CAM["cx"]) / CAM["fx"] * np.where(okm, z, 1.0),
                 (ys - CAM["cy"]) / CAM["fy"] * np.where(okm, z, 1.0),
                 np.where(okm, z, 1.0)], -1).astype(np.float32)
            from lidar_visual_odometry_tpu.ops import pointcloud as pc

            cxyz, cmask = pc.pad_points(pts_cam, cfg.depth_cloud_cap)
            cmask &= np.concatenate(
                [okm, np.zeros(cfg.depth_cloud_cap - okm.shape[0], bool)]
            )
            imgs.append(img)
            clouds.append(cxyz)
            masks.append(cmask)

        # per-frame reference
        vo = vf.VisualOdometry(cam, cfg)
        ref = [np.asarray(vo.process(
            jnp.asarray(imgs[k]), jnp.asarray(clouds[k]), jnp.asarray(masks[k])
        ).t) for k in range(4)]

        # fused chunk
        st = vf.init_chunk_state(
            jnp.asarray(imgs[0]), jnp.asarray(clouds[0]),
            jnp.asarray(masks[0]), cam, cfg,
        )
        st, poses = vf.visual_chunk(
            st,
            jnp.asarray(np.stack(imgs[1:])),
            jnp.asarray(np.stack(clouds[1:])),
            jnp.asarray(np.stack(masks[1:])),
            cam, cfg,
        )
        got = np.asarray(poses.t)
        # same math; tolerance covers XLA reassociation between the fused
        # and split compilations. Reassociation noise is ~1e-5, but a
        # feature sitting exactly on a binary gate (reverse-check px,
        # depth-association distance) can flip between compilations and
        # shift one pose by ~1e-3 — observed on the affine-LK path where
        # the 6×6 solve reassociates more (one element at 1.35e-3, the
        # other eight < 5e-5)
        np.testing.assert_allclose(got, np.stack(ref[1:]), atol=3e-3)
