"""Closed-form 3×3 eigen / line / plane fits vs numpy references."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.ops import fit


class TestEigh3x3:
    def test_matches_numpy(self, rng):
        X = rng.normal(size=(64, 5, 3)).astype(np.float32)
        A = np.einsum("nki,nkj->nij", X, X)
        lams, vecs = fit.eigh3x3(jnp.asarray(A))
        lams_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(lams), lams_np, rtol=1e-3, atol=1e-3)
        # eigenvector property: A v = λ v
        for i in range(3):
            v = np.asarray(vecs)[..., i]
            lv = np.asarray(lams)[..., i, None] * v
            Av = np.einsum("nij,nj->ni", A, v)
            np.testing.assert_allclose(Av, lv, rtol=1e-2, atol=1e-2)


class TestSolve3x3:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(32, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)
        b = rng.normal(size=(32, 3)).astype(np.float32)
        x = fit.solve3x3(jnp.asarray(A), jnp.asarray(b))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), want, rtol=1e-3, atol=1e-3)


class TestLineFit:
    def test_recovers_line(self, rng):
        direction = np.array([0.6, 0.8, 0.0], np.float32)
        t = np.linspace(-1, 1, 5)[:, None]
        pts = 3.0 + t * direction + 0.001 * rng.normal(size=(5, 3)).astype(np.float32)
        c, d, ok = fit.line_fit(
            jnp.asarray(pts[None]), jnp.ones((1, 5), bool)
        )
        assert bool(ok[0])
        cosang = abs(float(np.dot(np.asarray(d)[0], direction)))
        assert cosang > 0.999
        np.testing.assert_allclose(np.asarray(c)[0], pts.mean(0), atol=1e-4)

    def test_rejects_blob(self):
        # isotropic: octahedron vertices → equal eigenvalues, no dominant axis
        pts = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1]],
            np.float32,
        )[None]
        _, _, ok = fit.line_fit(jnp.asarray(pts), jnp.ones((1, 5), bool))
        assert not bool(ok[0])  # no dominant direction

    def test_rejects_partial_mask(self, rng):
        pts = rng.normal(size=(1, 5, 3)).astype(np.float32)
        mask = jnp.asarray([[True, True, True, True, False]])
        _, _, ok = fit.line_fit(jnp.asarray(pts), mask)
        assert not bool(ok[0])


class TestPlaneFit:
    def test_recovers_plane(self, rng):
        n_true = np.array([0.0, 0.0, 1.0], np.float32)
        pts = rng.uniform(-1, 1, size=(1, 5, 3)).astype(np.float32)
        pts[..., 2] = 2.0  # plane z = 2 → n·p + d = 0 with n=(0,0,±1), d=∓2
        n, d, ok = fit.plane_fit(jnp.asarray(pts), jnp.ones((1, 5), bool))
        assert bool(ok[0])
        nz = float(np.asarray(n)[0, 2])
        dv = float(np.asarray(d)[0])
        assert abs(abs(nz) - 1.0) < 1e-3
        np.testing.assert_allclose(nz * 2.0 + dv, 0.0, atol=1e-3)

    def test_rejects_nonplanar(self, rng):
        pts = 5 * rng.normal(size=(1, 5, 3)).astype(np.float32)
        _, _, ok = fit.plane_fit(jnp.asarray(pts), jnp.ones((1, 5), bool))
        assert not bool(ok[0])
