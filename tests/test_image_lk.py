"""Image ops + pyramidal LK tests on synthetic photo-consistent renders."""

import jax.numpy as jnp
import numpy as np
import pytest

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

    def test_bilinear_mxu_matches_gather(self, rng):
        """The one-hot MXU sampler == the 4-tap gather, including clamped
        borders and out-of-bounds coords (CPU f32 = exact arithmetic)."""
        imgs = jnp.asarray(rng.random((3, 24, 40)).astype(np.float32))
        uv = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-3.0, 43.0, (257, 4)),   # x, past both edges
                    rng.uniform(-3.0, 27.0, (257, 4)),   # y
                ],
                axis=-1,
            ).astype(np.float32)
        )
        out = image.bilinear_mxu(imgs, uv)
        assert out.shape == (3, 257, 4)
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(out[c]), np.asarray(image.bilinear(imgs[c], uv)),
                atol=1e-6,
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
        z0 = np.where(finite, z0, 0.0)
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


class TestPallasLK:
    def test_level_kernel_matches_xla(self, rng):
        """Gather-free Pallas LK level (interpret) vs the vmapped XLA tracker
        on interior features of a smooth textured pair with known shift."""
        from lidar_visual_odometry_tpu.ops import pallas_lk
        from lidar_visual_odometry_tpu.ops.image import gradients

        H, W = 120, 300
        base = rng.random((H + 10, W + 10)).astype(np.float32)

        def box(a, k=5):
            c = np.cumsum(np.pad(a, ((k, k), (0, 0))), axis=0)
            a = (c[k:] - c[:-k])[: a.shape[0]] / k
            c = np.cumsum(np.pad(a, ((0, 0), (k, k))), axis=1)
            return (c[:, k:] - c[:, :-k])[:, : a.shape[1]] / k

        sm = box(box(base)).astype(np.float32)
        img0, img1 = sm[:H, :W], sm[3:H + 3, 2:W + 2]   # true shift (-2, -3)

        N = 64
        uv = np.stack(
            [rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1
        ).astype(np.float32)
        gx, gy = gradients(jnp.asarray(img0))
        zero = jnp.zeros((N, 2), jnp.float32)
        d_ref, ok_ref = lk._track_level(
            jnp.asarray(img0), jnp.asarray(img1), gx, gy,
            jnp.asarray(uv), zero, win=15, iters=10,
        )
        d_ker, ok_ker = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), zero, win=15, iters=10, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_ker))
        np.testing.assert_allclose(
            np.asarray(d_ker), np.asarray(d_ref), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(d_ker).mean(0), [-2.0, -3.0], atol=1e-3
        )

    def test_level_kernel_active_skip(self, rng):
        """Inactive rows return (guess, ok=False) untouched; active rows are
        bit-identical to the unmasked kernel."""
        from lidar_visual_odometry_tpu.ops import pallas_lk
        from lidar_visual_odometry_tpu.ops.image import gradients

        H, W = 120, 300
        base = rng.random((H + 10, W + 10)).astype(np.float32)
        img0 = base[:H, :W]
        img1 = base[3:H + 3, 2:W + 2]
        N = 32
        uv = np.stack(
            [rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1
        ).astype(np.float32)
        gx, gy = gradients(jnp.asarray(img0))
        guess = rng.normal(size=(N, 2)).astype(np.float32)
        active = rng.random(N) < 0.5

        d_all, ok_all = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), jnp.asarray(guess), win=15, iters=6,
            interpret=True,
        )
        d_m, ok_m = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), jnp.asarray(guess), jnp.asarray(active),
            win=15, iters=6, interpret=True,
        )
        d_m, ok_m = np.asarray(d_m), np.asarray(ok_m)
        np.testing.assert_array_equal(d_m[active], np.asarray(d_all)[active])
        np.testing.assert_array_equal(
            ok_m[active], np.asarray(ok_all)[active]
        )
        np.testing.assert_array_equal(d_m[~active], guess[~active])
        assert not ok_m[~active].any()

    @pytest.mark.parametrize("H,W", [(94, 188), (47, 300), (188, 300)])
    def test_level_kernel_unaligned_height(self, rng, H, W):
        """Non-8-multiple heights (KITTI pyramid levels 188/94/47): the strip
        base clamp must never wrap patch rows via pltpu.roll. Features are
        deliberately placed in the BOTTOM band where the pre-fix clamp
        corrupted the template."""
        from lidar_visual_odometry_tpu.ops import lk, pallas_lk
        from lidar_visual_odometry_tpu.ops.image import gradients

        base = rng.random((H + 10, W + 10)).astype(np.float32)

        def box(a, k=5):
            c = np.cumsum(np.pad(a, ((k, k), (0, 0))), axis=0)
            a = (c[k:] - c[:-k])[: a.shape[0]] / k
            c = np.cumsum(np.pad(a, ((0, 0), (k, k))), axis=1)
            return (c[:, k:] - c[:, :-k])[:, : a.shape[1]] / k

        sm = box(box(base)).astype(np.float32)
        img0, img1 = sm[:H, :W], sm[3:H + 3, 2:W + 2]   # true shift (-2, -3)

        N = 64
        # bottom-band + scattered interior features
        uv = np.stack(
            [rng.uniform(20, W - 20, N),
             np.concatenate([rng.uniform(H - 22, H - 12, N // 2),
                             rng.uniform(12, H - 12, N - N // 2)])], -1
        ).astype(np.float32)
        gx, gy = gradients(jnp.asarray(img0))
        zero = jnp.zeros((N, 2), jnp.float32)
        d_ref, ok_ref = lk._track_level(
            jnp.asarray(img0), jnp.asarray(img1), gx, gy,
            jnp.asarray(uv), zero, win=15, iters=10,
        )
        d_ker, ok_ker = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), zero, win=15, iters=10, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_ker))
        np.testing.assert_allclose(
            np.asarray(d_ker), np.asarray(d_ref), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(d_ker).mean(0), [-2.0, -3.0], atol=1e-3
        )

    def test_level_kernel_affine_matches_xla(self, rng):
        """6-DOF deformation-compensated kernel (interpret) vs the XLA
        affine path, on a ZOOMING pair where translation-only LK is biased:
        both must agree and land near the true center flow."""
        from lidar_visual_odometry_tpu.ops import lk, pallas_lk
        from lidar_visual_odometry_tpu.ops.image import bilinear, gradients

        H, W = 120, 300
        base = rng.random((2 * H + 20, 2 * W + 20)).astype(np.float32)

        def box(a, k=5):
            c = np.cumsum(np.pad(a, ((k, k), (0, 0))), axis=0)
            a = (c[k:] - c[:-k])[: a.shape[0]] / k
            c = np.cumsum(np.pad(a, ((0, 0), (k, k))), axis=1)
            return (c[:, k:] - c[:, :-k])[:, : a.shape[1]] / k

        sm = jnp.asarray(box(box(base)).astype(np.float32))
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        # img0: unit sampling; img1: 4% zoom about the center + shift
        pts0 = np.stack([xs.ravel() + 10, ys.ravel() + 10], -1)
        cxy = np.array([W / 2, H / 2], np.float32)
        pts1 = (pts0 - 10 - cxy) * 1.04 + cxy + 10 + np.array([2.0, -1.0])
        img0 = np.asarray(bilinear(sm, jnp.asarray(pts0))).reshape(H, W)
        img1 = np.asarray(bilinear(sm, jnp.asarray(pts1))).reshape(H, W)
        # true flow at feature (x, y): solve pts1 = pts0 ⇒ img1 pixel u
        # shows img0 content at (u - shift - cxy)/1.04 + cxy… feature at
        # p in img0 appears in img1 at q with (q - cxy)*1.04 + shift… no:
        # img1(q) = sm((q - cxy)*1.04 + cxy + shift + 10), img0(p) =
        # sm(p + 10) ⇒ q = (p - shift - cxy)/1.04 + cxy
        N = 64
        uv = np.stack(
            [rng.uniform(25, W - 25, N), rng.uniform(25, H - 25, N)], -1
        ).astype(np.float32)
        uv_gt = (uv - np.array([2.0, -1.0]) - cxy) / 1.04 + cxy
        gt_flow = uv_gt - uv

        gx, gy = gradients(jnp.asarray(img0))
        init = jnp.asarray(gt_flow + rng.normal(0, 0.5, (N, 2))
                           ).astype(jnp.float32)
        d_ref, ok_ref = lk._track_level(
            jnp.asarray(img0), jnp.asarray(img1), gx, gy,
            jnp.asarray(uv), init, win=15, iters=10, affine=True,
        )
        d_ker, ok_ker = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), init, win=15, iters=10, affine=True,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_ker))
        np.testing.assert_allclose(
            np.asarray(d_ker), np.asarray(d_ref), atol=2e-3
        )
        # the affine solve must recover the zoomed flow nearly unbiased
        err = np.asarray(d_ker) - gt_flow
        assert np.abs(err.mean(0)).max() < 0.05, err.mean(0)
        # translation-only on the same pair is measurably biased (the
        # failure mode the affine columns remove)
        d2, _ = lk._track_level(
            jnp.asarray(img0), jnp.asarray(img1), gx, gy,
            jnp.asarray(uv), init, win=15, iters=10, affine=False,
        )
        err2 = np.asarray(d2) - gt_flow
        assert np.median(np.linalg.norm(err, axis=-1)) < \
            0.5 * np.median(np.linalg.norm(err2, axis=-1))

    def test_level_kernel_eps_termination(self, rng):
        """eps=0.01 (the reference's cv::TermCriteria EPS,
        featureTracking.cpp:211) terminates early yet lands within eps of
        the fixed-count solve on a smooth trackable pattern."""
        from lidar_visual_odometry_tpu.ops import lk, pallas_lk
        from lidar_visual_odometry_tpu.ops.image import gradients

        H, W = 120, 300
        base = rng.random((H + 10, W + 10)).astype(np.float32)

        def box(a, k=5):
            c = np.cumsum(np.pad(a, ((k, k), (0, 0))), axis=0)
            a = (c[k:] - c[:-k])[: a.shape[0]] / k
            c = np.cumsum(np.pad(a, ((0, 0), (k, k))), axis=1)
            return (c[:, k:] - c[:, :-k])[:, : a.shape[1]] / k

        sm = box(box(base)).astype(np.float32)
        img0, img1 = sm[:H, :W], sm[3:H + 3, 2:W + 2]   # true shift (-2, -3)

        N = 64
        uv = np.stack(
            [rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1
        ).astype(np.float32)
        gx, gy = gradients(jnp.asarray(img0))
        zero = jnp.zeros((N, 2), jnp.float32)
        d_fix, ok_fix = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), zero, win=15, iters=10, interpret=True,
        )
        d_eps, ok_eps = pallas_lk.lk_level(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv), zero, win=15, iters=10, eps=0.01,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ok_fix), np.asarray(ok_eps))
        # per-feature difference bounded by the termination epsilon (the
        # last skipped step is < eps by the exit condition)
        assert np.abs(np.asarray(d_eps) - np.asarray(d_fix)).max() < 0.01
        np.testing.assert_allclose(
            np.asarray(d_eps).mean(0), [-2.0, -3.0], atol=1e-2
        )

    def test_level_kernel_fixed_affine_and_return_affine(self, rng):
        """The batch8 kernel's fixed_affine input and return_affine output:
        (a) zero fixed params are bit-identical to the plain solve,
        (b) nonzero fixed params match the XLA fixed-affine path,
        (c) return_affine leaves (d, ok) unchanged and matches the XLA
        fitted params on well-conditioned features."""
        from lidar_visual_odometry_tpu.ops import pallas_lk
        from lidar_visual_odometry_tpu.ops.image import gradients

        H, W = 120, 300
        base = rng.random((H + 10, W + 10)).astype(np.float32)

        def box(a, k=5):
            c = np.cumsum(np.pad(a, ((k, k), (0, 0))), axis=0)
            a = (c[k:] - c[:-k])[: a.shape[0]] / k
            c = np.cumsum(np.pad(a, ((0, 0), (k, k))), axis=1)
            return (c[:, k:] - c[:, :-k])[:, : a.shape[1]] / k

        sm = box(box(base)).astype(np.float32)
        img0, img1 = sm[:H, :W], sm[3:H + 3, 2:W + 2]   # true shift (-2, -3)
        i0, i1 = jnp.asarray(img0), jnp.asarray(img1)

        N = 64
        uv = jnp.asarray(np.stack(
            [rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1
        ).astype(np.float32))
        zero = jnp.zeros((N, 2), jnp.float32)

        # (a) fixed_affine = 0 is the plain non-affine solve, bit-exact
        d_p, ok_p = pallas_lk.lk_level(
            i0, i1, uv, zero, win=15, iters=10, batch8=True, interpret=True,
        )
        d_0, ok_0 = pallas_lk.lk_level(
            i0, i1, uv, zero, None, jnp.zeros((N, 4), jnp.float32),
            win=15, iters=10, batch8=True, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_0))
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_0))

        # (b) nonzero fixed params: kernel vs XLA fixed-affine path
        fa = jnp.asarray(
            rng.normal(0, 0.01, (N, 4)).astype(np.float32)
        )
        d_k, ok_k = pallas_lk.lk_level(
            i0, i1, uv, zero, None, fa,
            win=15, iters=10, batch8=True, interpret=True,
        )
        gx, gy = gradients(i0)
        d_x, ok_x = lk._track_level(
            i0, i1, gx, gy, uv, zero, win=15, iters=10, fixed_affine=fa,
        )
        m = np.asarray(ok_k) & np.asarray(ok_x)
        assert m.sum() > 48
        np.testing.assert_allclose(
            np.asarray(d_k)[m], np.asarray(d_x)[m], atol=1e-3
        )

        # (c) return_affine: (d, ok) unchanged, A matches the XLA fit
        d_a, ok_a = pallas_lk.lk_level(
            i0, i1, uv, zero, win=15, iters=10, affine=True, batch8=True,
            interpret=True,
        )
        d_r, ok_r, A_k = pallas_lk.lk_level(
            i0, i1, uv, zero, win=15, iters=10, affine=True, batch8=True,
            return_affine=True, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_r))
        np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_r))
        _, ok_xa, A_x = lk._track_level(
            i0, i1, gx, gy, uv, zero, win=15, iters=10, affine=True,
            return_affine=True,
        )
        ma = np.asarray(ok_r) & np.asarray(ok_xa)
        assert ma.sum() > 48
        np.testing.assert_allclose(
            np.asarray(A_k)[ma], np.asarray(A_x)[ma], atol=2e-3
        )


class TestBoxSum:
    def test_matches_convolve2d(self, rng):
        import jax.scipy.signal as jss

        a = jnp.asarray(rng.random((48, 96)).astype(np.float32))
        for k in (3, 5, 21):
            want = jss.convolve2d(a, jnp.ones((k, k)), mode="same")
            got = image.box_sum(a, k)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_shallow_reverse_check_matches_full(rng):
    """reverse_levels=1 (warm-started at the negated forward flow) must keep
    the same inliers as the full-pyramid reverse on clean translation, and
    still reject features that fail the round trip."""
    from lidar_visual_odometry_tpu.ops import image, lk

    H, W = 96, 160
    yy, xx = np.mgrid[0:H, 0:W]
    img0 = (0.5 + 0.25 * np.sin(0.4 * xx) * np.cos(0.3 * yy)
            + 0.15 * np.sin(0.9 * xx + 1.3 * yy)).astype(np.float32)
    dx, dy = 3.6, -2.2
    img1 = (0.5 + 0.25 * np.sin(0.4 * (xx - dx)) * np.cos(0.3 * (yy - dy))
            + 0.15 * np.sin(0.9 * (xx - dx) + 1.3 * (yy - dy))).astype(
        np.float32
    )
    pyr0 = tuple(image.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(image.build_pyramid(jnp.asarray(img1), 3))
    uv = jnp.asarray(
        np.stack([rng.uniform(20, W - 20, 64),
                  rng.uniform(20, H - 20, 64)], -1).astype(np.float32)
    )
    uv_full, ok_full = lk.track_pyramid_reverse_checked(
        pyr0, pyr1, uv, win=15, iters=10, levels=3, max_reverse_err=1.0,
    )
    uv_sh, ok_sh = lk.track_pyramid_reverse_checked(
        pyr0, pyr1, uv, win=15, iters=10, levels=3, max_reverse_err=1.0,
        reverse_levels=1,
    )
    np.testing.assert_allclose(np.asarray(uv_sh), np.asarray(uv_full))
    of, os_ = np.asarray(ok_full), np.asarray(ok_sh)
    assert of.sum() > 32
    # shallow keeps ≥95% of the full-reverse inlier set
    assert (of & os_).sum() >= 0.95 * of.sum()


def test_reverse_affine_gate_leaves_forward_flow_unchanged(rng):
    """lk_reverse_affine only changes the reverse GATE leg: the accepted
    forward flow (uv1) must be bit-identical either way, and on clean
    translation the translation-only gate must keep (almost) the same
    inlier set. (End-to-end the affine gate is the accuracy winner —
    scripts/exp_lk_reverse_affine.py — this pins the invariant that makes
    the knob safe to sweep.)"""
    from lidar_visual_odometry_tpu.ops import image, lk

    H, W = 96, 160
    yy, xx = np.mgrid[0:H, 0:W]
    img0 = (0.5 + 0.25 * np.sin(0.4 * xx) * np.cos(0.3 * yy)
            + 0.15 * np.sin(0.9 * xx + 1.3 * yy)).astype(np.float32)
    dx, dy = 2.4, -1.7
    img1 = (0.5 + 0.25 * np.sin(0.4 * (xx - dx)) * np.cos(0.3 * (yy - dy))
            + 0.15 * np.sin(0.9 * (xx - dx) + 1.3 * (yy - dy))).astype(
        np.float32
    )
    pyr0 = tuple(image.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(image.build_pyramid(jnp.asarray(img1), 3))
    uv = jnp.asarray(
        np.stack([rng.uniform(20, W - 20, 64),
                  rng.uniform(20, H - 20, 64)], -1).astype(np.float32)
    )
    uv_a, ok_a = lk.track_pyramid_reverse_checked(
        pyr0, pyr1, uv, win=15, iters=10, levels=3, max_reverse_err=1.0,
        affine=True, reverse_affine=True,
    )
    for mode in (False, "fixed"):
        uv_t, ok_t = lk.track_pyramid_reverse_checked(
            pyr0, pyr1, uv, win=15, iters=10, levels=3, max_reverse_err=1.0,
            affine=True, reverse_affine=mode,
        )
        np.testing.assert_array_equal(np.asarray(uv_a), np.asarray(uv_t))
        oa, ot = np.asarray(ok_a), np.asarray(ok_t)
        assert oa.sum() > 32
        # pure translation has no deformation to absorb: gates must agree
        assert (oa & ot).sum() >= 0.95 * oa.sum()
