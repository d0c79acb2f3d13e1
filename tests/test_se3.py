"""SE(3)/SO(3) core tests: exp/log round trips, group axioms, adjoint identity,
de-skew interpolation — the closed-form checks SURVEY.md §4 calls for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_visual_odometry_tpu.ops import se3


def random_quat(rng, n=()):
    q = rng.normal(size=(*n, 4)).astype(np.float32)
    return np.asarray(se3.quat_normalize(jnp.asarray(q)))


def random_pose(rng, n=()):
    return se3.Pose(
        jnp.asarray(random_quat(rng, n)),
        jnp.asarray(rng.normal(size=(*n, 3)).astype(np.float32)),
    )


def pose_allclose(a, b, atol=1e-5):
    # q and -q are the same rotation
    qa, qb = np.asarray(a.q), np.asarray(b.q)
    sign = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
    np.testing.assert_allclose(qa, sign * qb, atol=atol)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=atol)


class TestQuat:
    def test_mul_vs_matrix(self, rng):
        a, b = jnp.asarray(random_quat(rng, (16,))), jnp.asarray(random_quat(rng, (16,)))
        Rab = se3.quat_to_matrix(se3.quat_mul(a, b))
        RaRb = se3.quat_to_matrix(a) @ se3.quat_to_matrix(b)
        np.testing.assert_allclose(np.asarray(Rab), np.asarray(RaRb), atol=1e-5)

    def test_rotate_vs_matrix(self, rng):
        q = jnp.asarray(random_quat(rng, (16,)))
        v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        rv = se3.quat_rotate(q, v)
        mv = jnp.einsum("nij,nj->ni", se3.quat_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(rv), np.asarray(mv), atol=1e-5)

    def test_matrix_quat_roundtrip(self, rng):
        q = jnp.asarray(random_quat(rng, (64,)))
        q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(q), np.asarray(sign * q2), atol=1e-5)

    def test_matrix_to_quat_all_pivots(self):
        # Rotations near pi about each axis exercise all 4 Shepperd pivots.
        for axis in np.eye(3, dtype=np.float32):
            w = jnp.asarray(axis * (np.pi - 1e-3))
            q = se3.so3_exp(w)
            q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
            sign = jnp.sign(jnp.sum(q * q2, axis=-1))
            np.testing.assert_allclose(np.asarray(q), np.asarray(sign * q2), atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        w2 = se3.so3_log(se3.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)

    def test_small_angle(self):
        w = jnp.asarray([[1e-8, -2e-8, 1e-9], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        q = se3.so3_exp(w)
        assert not np.any(np.isnan(np.asarray(q)))
        np.testing.assert_allclose(np.asarray(se3.so3_log(q)), np.asarray(w), atol=1e-7)

    def test_exp_matches_rodrigues(self, rng):
        w = np.asarray([0.3, -0.2, 0.5], dtype=np.float32)
        theta = np.linalg.norm(w)
        k = w / theta
        K = np.asarray(se3.so3_hat(jnp.asarray(k)))
        R_rod = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        R = np.asarray(se3.quat_to_matrix(se3.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(R, R_rod, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        # rotation part must stay inside the injectivity radius (|w| < pi)
        xi = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
        xi = xi.at[:, 3:].mul(0.5)
        xi2 = se3.se3_log(se3.se3_exp(xi))
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-3, rtol=1e-4)

    def test_compose_inverse(self, rng):
        p = random_pose(rng, (8,))
        ident = se3.se3_compose(p, se3.se3_inverse(p))
        pose_allclose(ident, se3.identity_pose((8,)), atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        p = random_pose(rng)
        x = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        y1 = se3.se3_apply(p, x)
        y2 = se3.se3_apply_matmul(p, x)
        T = np.asarray(se3.se3_matrix(p))
        y3 = x @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        p = random_pose(rng, (8,))
        p2 = se3.se3_from_matrix(se3.se3_matrix(p))
        pose_allclose(p, p2, atol=1e-5)

    def test_adjoint_identity(self, rng):
        # Ad_T xi == log(T exp(xi) T^-1) for small xi
        p = random_pose(rng)
        xi = jnp.asarray(0.01 * rng.normal(size=(6,)).astype(np.float32))
        lhs = se3.se3_adjoint(p) @ xi
        rhs = se3.se3_log(
            se3.se3_compose(se3.se3_compose(p, se3.se3_exp(xi)), se3.se3_inverse(p))
        )
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_so3t_exp_decoupled(self, rng):
        xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        p = se3.so3t_exp(xi)
        np.testing.assert_allclose(np.asarray(p.t), np.asarray(xi[:3]), atol=0)

    def test_pose_interpolate(self, rng):
        p = random_pose(rng)
        # s=1 returns p; s=0 returns identity; s=0.5 twice ~= p (for rotation)
        pose_allclose(se3.pose_interpolate(p, 1.0), p, atol=1e-5)
        pose_allclose(se3.pose_interpolate(p, 0.0), se3.identity_pose(), atol=1e-6)
        h = se3.pose_interpolate(p, 0.5)
        qq = se3.quat_mul(h.q, h.q)
        sign = jnp.sign(jnp.sum(qq * p.q, axis=-1))
        np.testing.assert_allclose(np.asarray(qq), np.asarray(sign * p.q), atol=1e-5)

    def test_jit_and_vmap(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
        f = jax.jit(jax.vmap(lambda x: se3.se3_log(se3.se3_exp(x))))
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-3, rtol=1e-4)


class TestYPR:
    def test_roundtrip(self, rng):
        ypr = jnp.asarray(
            np.stack([
                rng.uniform(-3, 3, 16), rng.uniform(-1.4, 1.4, 16),
                rng.uniform(-3, 3, 16),
            ], -1).astype(np.float32)
        )
        back = se3.quat_to_ypr(se3.ypr_to_quat(ypr))
        np.testing.assert_allclose(np.asarray(back), np.asarray(ypr), atol=1e-4)

    def test_pure_yaw(self):
        q = se3.ypr_to_quat(jnp.asarray([0.5, 0.0, 0.0]))
        R = np.asarray(se3.quat_to_matrix(q))
        want = np.array([
            [np.cos(0.5), -np.sin(0.5), 0], [np.sin(0.5), np.cos(0.5), 0], [0, 0, 1],
        ])
        np.testing.assert_allclose(R, want, atol=1e-6)


class TestAutodiffSafety:
    def test_exp_gradient_at_zero_twist(self):
        """d/dξ exp(ξ)·p at ξ=0 must be the analytic [I | −p^] with no NaNs
        (the Taylor guards must use the safe-where pattern — autodiff flows
        through BOTH where() branches)."""
        import jax

        p = jnp.asarray([0.4, -0.3, 5.0], jnp.float32)
        J = jax.jacobian(lambda d: se3.se3_apply(se3.se3_exp(d), p))(
            jnp.zeros(6, jnp.float32)
        )
        want = np.concatenate(
            [np.eye(3), -np.asarray(se3.so3_hat(p[None]))[0]], axis=-1
        )
        assert np.isfinite(np.asarray(J)).all()
        np.testing.assert_allclose(np.asarray(J), want, atol=1e-5)

    def test_log_gradient_at_identity(self):
        import jax

        g = jax.jacobian(
            lambda q: se3.so3_log(se3.quat_normalize(q))
        )(jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
