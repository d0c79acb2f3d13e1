"""Image ops + pyramidal LK tests on synthetic photo-consistent renders."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.ops import camera, image, lk

CAM = dict(fx=120.0, fy=120.0, cx=160.0, cy=48.0, width=320, height=96)


def render_pair(dx=0.3, dy=0.0, yaw=0.004):
    scene = synthetic.BoxScene.corridor(0)
    R0, t0 = synthetic.camera_from_velodyne_pose(
        synthetic.yaw_matrix(0.0), np.array([0.0, 0.0, 1.5])
    )
    R1, t1 = synthetic.camera_from_velodyne_pose(
        synthetic.yaw_matrix(yaw), np.array([dx, dy, 1.5])
    )
    img0, d0 = synthetic.render_image(scene, R0, t0, **CAM)
    img1, d1 = synthetic.render_image(scene, R1, t1, **CAM)
    return (img0, d0, R0, t0), (img1, d1, R1, t1)


class TestImageOps:
    def test_pyr_down_shape_and_mean(self, rng):
        img = jnp.asarray(rng.random((64, 128)).astype(np.float32))
        d = image.pyr_down(img)
        assert d.shape == (32, 64)
        np.testing.assert_allclose(
            float(d[0, 0]), float(img[:2, :2].mean()), rtol=1e-6
        )

    def test_bilinear_exact_on_grid(self, rng):
        img = jnp.asarray(rng.random((32, 32)).astype(np.float32))
        uv = jnp.asarray([[3.0, 5.0], [10.0, 20.0]])
        v = image.bilinear(img, uv)
        np.testing.assert_allclose(
            np.asarray(v), [float(img[5, 3]), float(img[20, 10])], rtol=1e-6
        )

    def test_bilinear_interpolates(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        v = float(image.bilinear(img, jnp.asarray([1.5, 0.0])))
        assert abs(v - 1.5) < 1e-6

    def test_shi_tomasi_peaks_on_corner(self):
        img = np.zeros((40, 40), np.float32)
        img[20:, 20:] = 1.0  # bright quadrant corner at (20, 20)
        s = np.asarray(image.shi_tomasi_score(jnp.asarray(img)))
        cy, cx = np.unravel_index(s.argmax(), s.shape)
        assert abs(cy - 20) <= 2 and abs(cx - 20) <= 2

    def test_grid_select_avoids_occupied(self, rng):
        (i0, *_), _ = render_pair()
        score = image.shi_tomasi_score(jnp.asarray(i0))
        occupied = jnp.asarray([[160.0, 48.0]])
        uv, ok = image.grid_select_features(
            score, occupied, jnp.ones(1, bool),
            grid_rows=3, grid_cols=8, per_cell=5,
        )
        sel = np.asarray(uv)[np.asarray(ok)]
        assert sel.shape[0] > 40
        d = np.linalg.norm(sel - np.array([160.0, 48.0]), axis=1)
        assert d.min() > 9.0  # suppression radius honored


class TestLK:
    def test_tracks_known_shift(self):
        (i0, d0, R0, t0), (i1, d1, R1, t1) = render_pair(dx=0.3)
        pyr0 = tuple(image.build_pyramid(jnp.asarray(i0), 4))
        pyr1 = tuple(image.build_pyramid(jnp.asarray(i1), 4))
        score = image.shi_tomasi_score(jnp.asarray(i0))
        uv0, ok0 = image.grid_select_features(
            score, jnp.zeros((1, 2)), jnp.zeros(1, bool),
            grid_rows=3, grid_cols=8, per_cell=5,
        )
        uv1, ok = lk.track_pyramid_reverse_checked(
            pyr0, pyr1, uv0, win=15, iters=10, levels=3
        )
        ok = np.asarray(ok) & np.asarray(ok0)
        assert ok.sum() > 30, ok.sum()

        # verify tracked displacement against geometric ground truth
        cam = camera.Pinhole(
            jnp.float32(CAM["fx"]), jnp.float32(CAM["fy"]),
            jnp.float32(CAM["cx"]), jnp.float32(CAM["cy"]),
            CAM["width"], CAM["height"], jnp.zeros(5),
        )
        u0 = np.asarray(uv0)[ok]
        u1 = np.asarray(uv1)[ok]
        z0 = np.asarray(d0)[
            np.clip(u0[:, 1].astype(int), 0, 95),
            np.clip(u0[:, 0].astype(int), 0, 319),
        ]
        finite = np.isfinite(z0)
        xn = (u0[:, 0] - CAM["cx"]) / CAM["fx"]
        yn = (u0[:, 1] - CAM["cy"]) / CAM["fy"]
        p_cam0 = np.stack([xn * z0, yn * z0, z0], -1)
        p_w = p_cam0 @ R0.T + t0
        p_cam1 = (p_w - t1) @ R1
        u1_gt = np.stack(
            [
                CAM["fx"] * p_cam1[:, 0] / p_cam1[:, 2] + CAM["cx"],
                CAM["fy"] * p_cam1[:, 1] / p_cam1[:, 2] + CAM["cy"],
            ],
            -1,
        )
        err = np.linalg.norm(u1 - u1_gt, axis=1)[finite]
        assert np.median(err) < 0.5, np.median(err)
