"""Tests for the robust-estimation and image-preprocessing ops added for
reference parity: t-dist fixed-point scale (WeightFunction.cpp:20-78),
LM trust-region driver (LSQNonlinear.hpp:84-194), CLAHE
(featureTracking.cpp:92-95), undistortion remap (PinholeModel.cpp:27-28,
192-200). Oracles: literal numpy transcriptions and closed forms — never
the implementation itself."""

import numpy as np
import jax.numpy as jnp

from lidar_visual_odometry_tpu.ops import camera, gn, image


def _tdist_scale_numpy(r, dof=5.0, init_sigma=5.0, iters=10):
    # literal transcription of the reference's fixed-point loop
    sigma2 = init_sigma**2
    for _ in range(iters):
        w = (dof + 1.0) / (dof + r * r / sigma2)
        sigma2 = max(float(np.mean(w * r * r)), 1e-12)
    return np.sqrt(sigma2)


def test_tdist_scale_matches_fixed_point_transcription():
    rng = np.random.default_rng(0)
    r = rng.standard_t(df=5, size=4096).astype(np.float32) * 2.5
    got = float(gn.tdist_scale(jnp.asarray(r), jnp.ones(r.shape, bool)))
    want = _tdist_scale_numpy(r)
    assert abs(got - want) < 1e-3 * want


def test_tdist_scale_masked_rows_ignored():
    rng = np.random.default_rng(1)
    r = rng.normal(size=512).astype(np.float32)
    r_pad = np.concatenate([r, 1e6 * np.ones(64, np.float32)])
    mask = np.concatenate([np.ones(512, bool), np.zeros(64, bool)])
    got = float(gn.tdist_scale(jnp.asarray(r_pad), jnp.asarray(mask)))
    want = _tdist_scale_numpy(r)
    assert abs(got - want) < 1e-3 * want


def test_lm_converges_on_exponential_fit():
    # classic LM benchmark: y = a·exp(b·x), nonlinear in b
    a_true, b_true = 3.0, -1.3
    x = jnp.linspace(0.0, 2.0, 64)
    y = a_true * jnp.exp(b_true * x)

    def build_system(p):
        a, b = p[0], p[1]
        e = jnp.exp(b * x)
        r = a * e - y
        J = jnp.stack([e, a * x * e], axis=-1)  # (N, 2)
        H = J.T @ J
        g = J.T @ r
        return H, g, jnp.sum(r * r)

    def update(p, delta):
        return p + delta

    p0 = jnp.asarray([1.0, 0.0], jnp.float32)
    p, chi = gn.lm_optimize(build_system, update, None, p0, iters=30)
    assert abs(float(p[0]) - a_true) < 1e-3
    assert abs(float(p[1]) - b_true) < 1e-3
    assert float(chi) < 1e-6


def test_lm_rejects_bad_steps_monotone_chi2():
    # a stiff Rosenbrock-style problem where plain GN overshoots: LM's
    # trust region must keep chi² non-increasing across accepted states.
    def build_system(p):
        r = jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])
        J = jnp.asarray([[0.0, 10.0], [-1.0, 0.0]]) + jnp.asarray(
            [[1.0, 0.0], [0.0, 0.0]]
        ) * (-20.0 * p[0])
        H = J.T @ J
        g = J.T @ r
        return H, g, jnp.sum(r * r)

    p0 = jnp.asarray([-1.2, 1.0], jnp.float32)
    _, chi0 = gn.lm_optimize(build_system, update_add, None, p0, iters=1)
    p, chi = gn.lm_optimize(build_system, update_add, None, p0, iters=60)
    assert float(chi) <= float(chi0) + 1e-9
    assert abs(float(p[0]) - 1.0) < 1e-2
    assert abs(float(p[1]) - 1.0) < 1e-2


def update_add(p, delta):
    return p + delta


def _clahe_numpy(img, grid=(4, 4), clip_limit=3.0, n_bins=64):
    # independent loop transcription of standard CLAHE with one-pass
    # uniform excess redistribution (same spec the op implements)
    H, W = img.shape
    gr, gc = grid
    th = -(-H // gr)
    tw = -(-W // gc)
    x = np.pad(img, ((0, gr * th - H), (0, gc * tw - W)), mode="edge")
    b = np.clip(np.round(x * (n_bins - 1)).astype(int), 0, n_bins - 1)
    luts = np.zeros((gr, gc, n_bins))
    area = th * tw
    cl = max(clip_limit * area / n_bins, 1.0)
    for i in range(gr):
        for j in range(gc):
            tile = b[i * th : (i + 1) * th, j * tw : (j + 1) * tw]
            hist = np.bincount(tile.reshape(-1), minlength=n_bins).astype(float)
            excess = np.maximum(hist - cl, 0.0).sum()
            hist = np.minimum(hist, cl) + excess / n_bins
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(cdf * (n_bins - 1) / area, 0, n_bins - 1)
    out = np.zeros_like(x)
    Hp, Wp = x.shape
    for yy in range(Hp):
        for xx in range(Wp):
            # cv::CLAHE interpolation: neighbor indices are computed from the
            # UNCLAMPED floor and clamped afterwards, so pixels outside the
            # first/last tile centers collapse both indices onto the edge
            # tile (modules/imgproc/src/clahe.cpp, CLAHE_Interpolation_Body)
            fy = (yy + 0.5) / th - 0.5
            fx = (xx + 0.5) / tw - 0.5
            wy = fy - np.floor(fy)
            wx = fx - np.floor(fx)
            y0 = int(max(np.floor(fy), 0))
            x0 = int(max(np.floor(fx), 0))
            y1 = int(min(np.floor(fy) + 1, gr - 1))
            x1 = int(min(np.floor(fx) + 1, gc - 1))
            k = b[yy, xx]
            v = (
                luts[y0, x0, k] * (1 - wy) * (1 - wx)
                + luts[y0, x1, k] * (1 - wy) * wx
                + luts[y1, x0, k] * wy * (1 - wx)
                + luts[y1, x1, k] * wy * wx
            )
            out[yy, xx] = v / (n_bins - 1)
    return out[:H, :W]


def test_clahe_matches_loop_transcription():
    rng = np.random.default_rng(2)
    img = rng.random((37, 53)).astype(np.float32) ** 2  # skewed histogram
    got = np.asarray(
        image.clahe(jnp.asarray(img), grid=(4, 4), clip_limit=3.0, n_bins=64)
    )
    want = _clahe_numpy(img.astype(np.float64), (4, 4), 3.0, 64)
    assert np.max(np.abs(got - want)) < 1e-3


def test_clahe_flattens_histogram():
    # low-contrast image: CLAHE must expand the value range
    rng = np.random.default_rng(3)
    img = (0.45 + 0.05 * rng.random((64, 64))).astype(np.float32)
    out = np.asarray(image.clahe(jnp.asarray(img)))
    assert out.std() > 2.0 * img.std()
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def _cam(dist):
    return camera.Pinhole(
        jnp.float32(120.0), jnp.float32(120.0),
        jnp.float32(64.0), jnp.float32(48.0),
        128, 96,
        jnp.asarray(dist, jnp.float32),
    )


def test_undistort_map_identity_when_no_distortion():
    cam = _cam([0, 0, 0, 0, 0])
    m = np.asarray(camera.undistort_rectify_map(cam))
    u, v = np.meshgrid(np.arange(128), np.arange(96))
    assert np.max(np.abs(m[..., 0] - u)) < 1e-4
    assert np.max(np.abs(m[..., 1] - v)) < 1e-4


def test_undistort_image_matches_closed_form():
    # src pixel value = smooth g(u, v); undistorted output at p must be
    # g(distort(p)) with distort from an independent Brown-Conrady transcription
    k1, k2, p1, p2, k3 = 0.02, -0.005, 0.001, -0.002, 0.0
    cam = _cam([k1, k2, p1, p2, k3])

    u, v = np.meshgrid(np.arange(128, dtype=np.float64),
                       np.arange(96, dtype=np.float64))

    def g(uu, vv):
        return 0.5 + 0.3 * np.sin(uu / 17.0) * np.cos(vv / 13.0)

    src = g(u, v).astype(np.float32)
    out = np.asarray(
        camera.undistort_image(jnp.asarray(src), camera.undistort_rectify_map(cam))
    )

    xn = (u - 64.0) / 120.0
    yn = (v - 48.0) / 120.0
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2**3
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    want = g(120.0 * xd + 64.0, 120.0 * yd + 48.0)

    # compare away from borders (remap clamps there)
    inner = (slice(8, 88), slice(8, 120))
    assert np.max(np.abs(out[inner] - want[inner])) < 2e-3
