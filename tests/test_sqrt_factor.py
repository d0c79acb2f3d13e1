"""Square-root photometric factor (V14/V21) tests: condensation algebra,
step parity with the full per-pixel system, and the README's Basalt-vs-
numeric Jacobian cross-check (/root/reference/README.md:65-100) as actual
assertions — two independent analytic derivations of the reprojection
Jacobian w.r.t. the host/target world poses (chain rule through the relative
pose with the SE(3) adjoint, vs direct left-perturbation) against autodiff.
"""

import numpy as np

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.models import sqrt_photometric as sq
from lidar_visual_odometry_tpu.ops import se3


def _rand_pose(rng, scale_r=0.3, scale_t=1.0):
    xi = np.concatenate([
        rng.normal(scale=scale_t, size=3),
        rng.normal(scale=scale_r, size=3),
    ]).astype(np.float32)
    return se3.se3_exp(jnp.asarray(xi))


class TestCondense:
    def test_reconstructs_system(self, rng):
        A = rng.normal(size=(10, 6)).astype(np.float32)
        H = jnp.asarray(A.T @ A)
        g = jnp.asarray(rng.normal(size=6).astype(np.float32))
        J_lin, r_lin = sq.condense(H, g)
        np.testing.assert_allclose(
            np.asarray(J_lin.T @ J_lin), np.asarray(H), atol=1e-3
        )
        # J_linᵀ r_lin = −g on the non-degenerate subspace
        np.testing.assert_allclose(
            np.asarray(J_lin.T @ r_lin), -np.asarray(g), atol=1e-4
        )

    def test_step_equals_full_gn_step(self, rng):
        A = rng.normal(size=(24, 6)).astype(np.float32)
        H = jnp.asarray(A.T @ A) + 0.1 * jnp.eye(6)
        g = jnp.asarray(rng.normal(size=6).astype(np.float32))
        J_lin, r_lin = sq.condense(H, g)
        delta = sq.factor_step(J_lin, r_lin)
        want = jnp.linalg.solve(H, g)
        np.testing.assert_allclose(
            np.asarray(delta), np.asarray(want), atol=1e-3
        )

    def test_rank_deficient_zeros_null_directions(self):
        """Degenerate directions (eigenvalue ≤ eps) must contribute nothing:
        the reference's (eig > eps).select (FrameTracker.cpp:40-42)."""
        # H constrains only the first tangent coordinate
        H = jnp.diag(jnp.asarray([4.0, 0, 0, 0, 0, 0], jnp.float32))
        g = jnp.asarray([2.0, 1.0, 1.0, 1.0, 1.0, 1.0], jnp.float32)
        J_lin, r_lin = sq.condense(H, g)
        delta = sq.factor_step(J_lin, r_lin, lm_lambda=1e-6)
        np.testing.assert_allclose(float(delta[0]), 0.5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(delta[1:]), 0.0, atol=1e-4)


class TestFactorParity:
    def test_factor_step_matches_direct_tracker_step(self, rng):
        """One GN step from the condensed factor == one inner step of
        tracker_direct's full per-pixel system at the same linearization."""
        from lidar_visual_odometry_tpu.data import synthetic
        from lidar_visual_odometry_tpu.models.tracker_direct import (
            _level_cam, _photometric_system,
        )
        from lidar_visual_odometry_tpu.ops import camera

        scene = synthetic.BoxScene.corridor(0)
        cam = camera.Pinhole(
            jnp.float32(120.0), jnp.float32(120.0),
            jnp.float32(64.0), jnp.float32(48.0), 128, 96, jnp.zeros(5),
        )
        CAM = dict(fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96)
        R0, t0 = synthetic.camera_from_velodyne_pose(
            np.eye(3), np.array([0.0, 0.0, 1.5])
        )
        img0, depth0 = synthetic.render_image(scene, R0, t0, **CAM)
        R1, t1 = synthetic.camera_from_velodyne_pose(
            synthetic.yaw_matrix(0.01), np.array([0.15, 0.0, 1.5])
        )
        img1, _ = synthetic.render_image(scene, R1, t1, **CAM)

        ys, xs = np.mgrid[4:92:4, 4:124:4]
        z = depth0[ys, xs]
        ok = np.isfinite(z)
        z = np.where(ok, z, 0.0)
        pts = np.stack(
            [(xs - CAM["cx"]) / CAM["fx"] * z,
             (ys - CAM["cy"]) / CAM["fy"] * z, z], -1
        ).reshape(-1, 3).astype(np.float32)
        mask = ok.reshape(-1)
        pts = jnp.asarray(np.nan_to_num(pts))
        mask = jnp.asarray(mask)

        T = se3.se3_exp(
            jnp.asarray([0.05, -0.02, 0.03, 0.005, -0.01, 0.008], jnp.float32)
        )
        cam_l = _level_cam(cam, 0)
        i0, i1 = jnp.asarray(np.nan_to_num(img0)), jnp.asarray(
            np.nan_to_num(img1)
        )

        J_lin, r_lin = sq.photometric_sqrt_factor(
            T, i0, i1, pts, mask, cam_l, tdist_dof=5.0
        )
        delta_factor = sq.factor_step(J_lin, r_lin, lm_lambda=1e-6)

        r, J, w, _ = _photometric_system(T, i0, i1, pts, mask, cam_l, 5.0)
        H = jnp.einsum("nd,ndi,ndj->ij", w, J, J)
        g = -jnp.einsum("nd,ndi,nd->i", w, J, r)
        delta_full = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
        np.testing.assert_allclose(
            np.asarray(delta_factor), np.asarray(delta_full),
            atol=2e-3, rtol=1e-2,
        )


def _project(p):
    return p[:2] / p[2]


def _reproj(T_w_h, T_w_t, p_h):
    """Host-frame point → target-frame normalized-plane coords."""
    p_w = se3.se3_apply(T_w_h, p_h)
    p_t = se3.se3_apply(se3.se3_inverse(T_w_t), p_w)
    return _project(p_t)


class TestBasaltJacobianExercise:
    """The README's course exercise (README.md:65-100): the Basalt chain rule
    through the relative pose (with the SE(3) adjoint) and the direct
    left-perturbation derivation must agree — verified against autodiff."""

    def _fixture(self, rng):
        T_w_h = _rand_pose(rng)
        T_w_t = _rand_pose(rng)
        p_h = jnp.asarray(
            np.asarray([0.4, -0.3, 5.0], np.float32)
            + rng.normal(scale=0.5, size=3).astype(np.float32)
        )
        return T_w_h, T_w_t, p_h

    @staticmethod
    def _duv_dp(p):
        x, y, z = p
        return jnp.asarray([
            [1.0 / z, 0.0, -x / (z * z)],
            [0.0, 1.0 / z, -y / (z * z)],
        ])

    def test_both_derivations_match_autodiff_host(self, rng):
        T_w_h, T_w_t, p_h = self._fixture(rng)
        T_rel = se3.se3_compose(se3.se3_inverse(T_w_t), T_w_h)  # t ← h
        p_t = se3.se3_apply(T_rel, p_h)
        duv = self._duv_dp(p_t)

        # (a) Basalt: perturb the RELATIVE pose, transport to the host pose:
        # T_rel(δ) = T_t⁻¹ exp(δ_h) T_h ⇒ δ_rel = Adj(T_t⁻¹) δ_h
        dp_drel = jnp.concatenate(
            [jnp.eye(3), -se3.so3_hat(p_t[None])[0]], axis=-1
        )                                                      # (3, 6)
        J_basalt = duv @ dp_drel @ se3.se3_adjoint(se3.se3_inverse(T_w_t))

        # (b) direct left-perturbation of the WORLD host pose:
        # p_w(δ) = exp(δ) p_w ⇒ ∂p_w/∂δ = [I | −p_w^]; then rotate R_t⁻¹
        p_w = se3.se3_apply(T_w_h, p_h)
        R_t_inv = se3.quat_to_matrix(se3.quat_conj(T_w_t.q))
        dpw = jnp.concatenate(
            [jnp.eye(3), -se3.so3_hat(p_w[None])[0]], axis=-1
        )
        J_direct = duv @ R_t_inv @ dpw

        # (c) autodiff ground truth under the same left perturbation
        def f(xi):
            T_h = se3.se3_compose(se3.se3_exp(xi), T_w_h)
            return _reproj(T_h, T_w_t, p_h)

        J_num = jax.jacobian(f)(jnp.zeros(6, jnp.float32))

        np.testing.assert_allclose(
            np.asarray(J_basalt), np.asarray(J_num), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(J_direct), np.asarray(J_num), atol=1e-4
        )

    def test_both_derivations_match_autodiff_target(self, rng):
        T_w_h, T_w_t, p_h = self._fixture(rng)
        T_rel = se3.se3_compose(se3.se3_inverse(T_w_t), T_w_h)
        p_t = se3.se3_apply(T_rel, p_h)
        duv = self._duv_dp(p_t)

        # (a) Basalt: T_rel(δ) = (exp(δ_t) T_t)⁻¹ T_h = T_t⁻¹ exp(−δ_t) T_h
        # ⇒ δ_rel = −Adj(T_t⁻¹) δ_t
        dp_drel = jnp.concatenate(
            [jnp.eye(3), -se3.so3_hat(p_t[None])[0]], axis=-1
        )
        J_basalt = -(duv @ dp_drel @ se3.se3_adjoint(se3.se3_inverse(T_w_t)))

        # (b) direct: p_t(δ) = (exp(δ) T_t)⁻¹ p_w = T_t⁻¹ exp(−δ) p_w
        # ⇒ ∂p_t/∂δ = −R_t⁻¹ [I | −p_w^]
        p_w = se3.se3_apply(T_w_h, p_h)
        R_t_inv = se3.quat_to_matrix(se3.quat_conj(T_w_t.q))
        dpw = jnp.concatenate(
            [jnp.eye(3), -se3.so3_hat(p_w[None])[0]], axis=-1
        )
        J_direct = -(duv @ R_t_inv @ dpw)

        def f(xi):
            T_t = se3.se3_compose(se3.se3_exp(xi), T_w_t)
            return _reproj(T_w_h, T_t, p_h)

        J_num = jax.jacobian(f)(jnp.zeros(6, jnp.float32))

        np.testing.assert_allclose(
            np.asarray(J_basalt), np.asarray(J_num), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(J_direct), np.asarray(J_num), atol=1e-4
        )
