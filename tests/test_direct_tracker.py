"""Direct photometric tracker + keyframe sampling tests."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import keyframe as kfm
from lidar_visual_odometry_tpu.models import tracker_direct as td
from lidar_visual_odometry_tpu.ops import camera, image, se3

CAM = dict(fx=120.0, fy=120.0, cx=160.0, cy=48.0, width=320, height=96)


def make_cam():
    return camera.Pinhole(
        jnp.float32(CAM["fx"]), jnp.float32(CAM["fy"]),
        jnp.float32(CAM["cx"]), jnp.float32(CAM["cy"]),
        CAM["width"], CAM["height"], jnp.zeros(5),
    )


def render_at(scene, yaw, pos):
    R, t = synthetic.camera_from_velodyne_pose(
        synthetic.yaw_matrix(yaw), np.asarray(pos)
    )
    img, depth = synthetic.render_image(scene, R, t, **CAM)
    return img, depth, R, t


def depth_to_points(depth, rng, n=8192):
    ys = rng.integers(0, CAM["height"], n)
    xs = rng.integers(0, CAM["width"], n)
    z = depth[ys, xs]
    ok = np.isfinite(z)
    z = np.where(ok, z, 1.0)
    pts = np.stack(
        [
            (xs - CAM["cx"]) / CAM["fx"] * z,
            (ys - CAM["cy"]) / CAM["fy"] * z,
            z,
        ],
        axis=-1,
    ).astype(np.float32)
    return pts, ok


class TestKeyframeSampling:
    def test_selects_gradient_points(self, rng):
        scene = synthetic.BoxScene.corridor(0)
        img, depth, R, t = render_at(scene, 0.0, [0.0, 0.0, 1.5])
        pts, ok = depth_to_points(depth, rng)
        kf = kfm.make_keyframe(
            jnp.asarray(img), make_cam(), jnp.asarray(pts), jnp.asarray(ok),
            se3.identity_pose(), levels=3, cap=1024,
        )
        n_sel = int(np.asarray(kf.point_mask).sum())
        assert 50 < n_sel <= 1024, n_sel
        # selected points project inside the image
        from lidar_visual_odometry_tpu.ops import camera as cam_ops

        uv, front = cam_ops.project(make_cam(), kf.points)
        m = np.asarray(kf.point_mask)
        assert np.asarray(front)[m].all()


class TestDirectTracker:
    def test_recovers_motion(self, rng):
        scene = synthetic.BoxScene.corridor(0)
        img0, depth0, R0, t0 = render_at(scene, 0.0, [0.0, 0.0, 1.5])
        img1, depth1, R1, t1 = render_at(scene, 0.006, [0.35, 0.05, 1.5])
        pts, okm = depth_to_points(depth0, rng)
        cam = make_cam()
        kf = kfm.make_keyframe(
            jnp.asarray(img0), cam, jnp.asarray(pts), jnp.asarray(okm),
            se3.identity_pose(), levels=3, cap=1024,
        )
        cur_pyr = tuple(image.build_pyramid(jnp.asarray(img1), 3))

        # GT: p_cam1 = R1ᵀ(p_w − t1), p_w = R0 p_cam0 + t0
        R_rel = R1.T @ R0
        t_rel = R1.T @ (t0 - t1)
        T_gt = se3.Pose(
            se3.matrix_to_quat(jnp.asarray(R_rel, dtype=jnp.float32)),
            jnp.asarray(t_rel, dtype=jnp.float32),
        )

        T = td.track(
            kf, cur_pyr, cam, se3.identity_pose(),
            levels=3, iters_per_level=15,
        )
        err = se3.se3_log(se3.se3_compose(se3.se3_inverse(T_gt), T))
        assert float(jnp.linalg.norm(err[:3])) < 0.05, np.asarray(err)
        assert float(jnp.linalg.norm(err[3:])) < 0.01, np.asarray(err)

    def test_identity_motion_stays_identity(self, rng):
        scene = synthetic.BoxScene.corridor(0)
        img0, depth0, *_ = render_at(scene, 0.0, [0.0, 0.0, 1.5])
        pts, okm = depth_to_points(depth0, rng)
        cam = make_cam()
        kf = kfm.make_keyframe(
            jnp.asarray(img0), cam, jnp.asarray(pts), jnp.asarray(okm),
            se3.identity_pose(), levels=3, cap=1024,
        )
        cur_pyr = tuple(image.build_pyramid(jnp.asarray(img0), 3))
        T = td.track(kf, cur_pyr, cam, se3.identity_pose(), levels=3)
        assert float(jnp.linalg.norm(T.t)) < 5e-3


class TestDirectVOPipeline:
    def test_sequence_tracking_with_window_ba(self, rng):
        from lidar_visual_odometry_tpu.models.direct_vo import DirectVO
        from lidar_visual_odometry_tpu.utils.config import VisualConfig

        scene = synthetic.BoxScene.corridor(0)
        cam = make_cam()
        cfg = VisualConfig(pyramid_levels=3, keyframe_window=3)
        vo = DirectVO(cam, cfg, point_cap=512)

        poses_gt = []
        est = []
        for k in range(4):
            img, depth, R, t = render_at(
                scene, 0.004 * k, [0.35 * k, 0.0, 1.5]
            )
            pts, okm = depth_to_points(depth, rng, n=8192)
            pose = vo.process(
                jnp.asarray(img), jnp.asarray(pts), jnp.asarray(okm)
            )
            poses_gt.append((R, t))
            est.append(np.asarray(pose.t))

        R0, t0 = poses_gt[0]
        for k in range(1, 4):
            Rk, tk = poses_gt[k]
            gt_t = (tk - t0) @ R0  # world → frame-0 camera coords
            err = np.linalg.norm(est[k] - gt_t)
            assert err < 0.12, (k, est[k], gt_t)


class TestKeyframeDB:
    def test_archive_grows_and_reprojects(self, rng):
        """Append-only archive (KeyframeDB.cpp:19-55): grows past the FIFO
        window size, and the accumulated reprojection places a same-pose
        keyframe's points at their own image coordinates."""
        scene = synthetic.BoxScene.corridor(0)
        cam = make_cam()
        db = kfm.KeyframeDB()
        kfs = []
        for k in range(7):   # > the reference's 5-frame window
            img, depth, R, t = render_at(scene, 0.002 * k, [0.3 * k, 0.0, 1.5])
            pts, ok = depth_to_points(depth, rng)
            R_q = se3.matrix_to_quat(jnp.asarray(R, dtype=jnp.float32))
            kf = kfm.make_keyframe(
                jnp.asarray(img), cam, jnp.asarray(pts), jnp.asarray(ok),
                se3.Pose(R_q, jnp.asarray(t, dtype=jnp.float32)),
                levels=2, cap=512,
            )
            db.add(kf)
            kfs.append(kf)
        assert len(db) == 7

        uv, ok = db.accum_points_in_latest(cam, num_keyframe=3, level=0)
        assert ok.sum() > 50
        # the LAST keyframe's own points (identity relative pose) must land
        # exactly at their projections
        from lidar_visual_odometry_tpu.ops import camera as cam_ops

        uv_self, _ = cam_ops.project(cam, kfs[-1].points)
        m = np.asarray(kfs[-1].point_mask)
        np.testing.assert_allclose(
            uv[-m.shape[0]:][m], np.asarray(uv_self)[m], atol=1e-3
        )


class TestDirectChunk:
    def test_chunk_matches_host_loop(self, rng):
        """The fused K-frame device program must reproduce the host
        DirectVO.process loop (always-keyframe mode, window BA on) — the
        chunk replaces per-frame float() syncs, not the algorithm."""
        from lidar_visual_odometry_tpu.models import direct_vo as dv
        from lidar_visual_odometry_tpu.models.lidar_odometry import (
            QUANT_OFFSET, QUANT_SCALE,
        )
        from lidar_visual_odometry_tpu.utils.config import VisualConfig

        scene = synthetic.BoxScene.corridor(0)
        cam = make_cam()
        cfg = VisualConfig(pyramid_levels=3, keyframe_window=3)

        frames = []
        for k in range(5):
            img, depth, R, t = render_at(
                scene, 0.004 * k, [0.35 * k, 0.0, 1.5]
            )
            pts, okm = depth_to_points(depth, rng, n=8192)
            # quantize exactly like the chunk upload so both paths see the
            # same inputs
            q = (np.clip((pts - QUANT_OFFSET) / QUANT_SCALE, 0, 65535.0)
                 + 0.5).astype(np.uint16)
            deq = q.astype(np.float32) * QUANT_SCALE + QUANT_OFFSET
            im8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
            frames.append((im8, deq, okm))

        # host loop (on dequantized inputs, uint8 images)
        vo = dv.DirectVO(cam, cfg, point_cap=512)
        host_t = []
        for im8, deq, okm in frames:
            pose = vo.process(
                jnp.asarray(im8.astype(np.float32) / 255.0),
                jnp.asarray(deq), jnp.asarray(okm),
            )
            host_t.append(np.asarray(pose.t))

        # fused chunk
        vo2 = dv.DirectVOChunked(cam, cfg, point_cap=512)
        ts, qs, _ = vo2.run_chunked(
            [f[0] for f in frames], [f[1] for f in frames],
            [f[2] for f in frames], chunk=2,
        )
        np.testing.assert_allclose(ts, np.stack(host_t), atol=2e-4)
