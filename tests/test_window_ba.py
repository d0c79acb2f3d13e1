"""Photometric window BA: perturbed keyframe poses must move back toward
ground truth (gauge-fixed on frame 0)."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import keyframe as kfm
from lidar_visual_odometry_tpu.models import window_ba
from lidar_visual_odometry_tpu.ops import camera, se3

CAM = dict(fx=120.0, fy=120.0, cx=160.0, cy=48.0, width=320, height=96)


def make_cam():
    return camera.Pinhole(
        jnp.float32(CAM["fx"]), jnp.float32(CAM["fy"]),
        jnp.float32(CAM["cx"]), jnp.float32(CAM["cy"]),
        CAM["width"], CAM["height"], jnp.zeros(5),
    )


def build_window(n_kf=3, seed=0):
    scene = synthetic.BoxScene.corridor(0)
    rng = np.random.default_rng(seed)
    cam = make_cam()
    window = kfm.KeyframeWindow(n_kf)
    gt_poses = []
    R0 = t0 = None
    for k in range(n_kf):
        R, t = synthetic.camera_from_velodyne_pose(
            synthetic.yaw_matrix(0.01 * k), np.array([0.5 * k, 0.0, 1.5])
        )
        if k == 0:
            R0, t0 = R, t
        img, depth = synthetic.render_image(scene, R, t, **CAM)
        ys = rng.integers(0, CAM["height"], 8192)
        xs = rng.integers(0, CAM["width"], 8192)
        z = depth[ys, xs]
        ok = np.isfinite(z)
        zs = np.where(ok, z, 1.0)
        pts = np.stack(
            [
                (xs - CAM["cx"]) / CAM["fx"] * zs,
                (ys - CAM["cy"]) / CAM["fy"] * zs,
                zs,
            ],
            -1,
        ).astype(np.float32)
        # world pose relative to frame 0 (camera convention)
        R_w = R0.T @ R
        t_w = R0.T @ (t - t0)
        pose_w = se3.Pose(
            se3.matrix_to_quat(jnp.asarray(R_w, dtype=jnp.float32)),
            jnp.asarray(t_w, dtype=jnp.float32),
        )
        gt_poses.append(pose_w)
        window.add(
            kfm.make_keyframe(
                jnp.asarray(img), cam, jnp.asarray(pts), jnp.asarray(ok),
                pose_w, levels=3, cap=512,
            )
        )
    return window, gt_poses, cam


def test_ba_reduces_pose_error():
    window, gt_poses, cam = build_window(3)
    pyrs, points, masks, poses = window.stacked()

    # perturb keyframes 1, 2 (frame 0 is the gauge anchor)
    rng = np.random.default_rng(1)
    noise = np.zeros((3, 6), np.float32)
    noise[1] = [0.04, -0.03, 0.02, 0.004, -0.006, 0.005]
    noise[2] = [-0.03, 0.04, -0.03, -0.005, 0.004, -0.006]
    dq = se3.so3_exp(jnp.asarray(noise[:, 3:]))
    perturbed = se3.Pose(
        se3.quat_normalize(se3.quat_mul(dq, poses.q)),
        poses.t + jnp.asarray(noise[:, :3]),
    )

    refined = window_ba.refine(
        pyrs, points, masks, perturbed, cam, n_iters=8, level=0
    )

    def pose_err(est, k):
        gt = gt_poses[k]
        e = se3.se3_log(
            se3.se3_compose(
                se3.se3_inverse(gt), se3.Pose(est.q[k], est.t[k])
            )
        )
        return float(jnp.linalg.norm(e))

    for k in (1, 2):
        before = pose_err(perturbed, k)
        after = pose_err(refined, k)
        assert after < 0.5 * before, (k, before, after)
    # gauge frame stays put
    assert pose_err(refined, 0) < 1e-3
