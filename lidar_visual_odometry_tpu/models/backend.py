"""IMU + visual-odometry fusion back-end (≡ BackEndSolver/State, activated).

The reference ships a GTSAM ISAM2 smoother that is never constructed in the
main path (``src/vloam/BackEndSolver.cpp``, SURVEY.md V15 "dormant"): IMU
preintegration (``create_imu_factor`` ``:22-76``), static initialization from
accel/gyro means with gravity alignment (``trytoinitialize`` ``:152-281``),
visual relative-pose between-factors (``:93-146``), and an incremental solve.

This module provides the same capability as a TPU-native sliding-window
factor-graph Gauss-Newton — at window sizes of 10-20 states an incremental
Bayes tree buys nothing on accelerator hardware, so the whole window re-solves
each update as one batched GN (SURVEY.md §2.3):

* ``preintegrate``: classic midpoint IMU preintegration (Δq, Δv, Δp) with
  bias-free noise propagation — the CombinedImuFactor measurement.
* ``gravity_align_init``: static initialization from averaged accel.
* ``solve_window``: GN over states (q, p, v) with IMU factors between
  consecutive states and relative-pose (between) factors from odometry;
  Jacobians via ``jax.jacfwd`` over the small residual stack (the window is
  tiny — autodiff costs nothing and keeps the factors exactly consistent).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3

GRAVITY = 9.81


class ImuDelta(NamedTuple):
    """Preintegrated IMU measurement between two states."""

    dq: jax.Array    # (4,) orientation delta (body_i → body_j)
    dv: jax.Array    # (3,) velocity delta in frame i
    dp: jax.Array    # (3,) position delta in frame i
    dt: jax.Array    # () total time


class WindowState(NamedTuple):
    """Stacked navigation states (≡ gtsam State.h:15-116, minus bias which the
    reference also never estimates online — biases enter via config priors)."""

    q: jax.Array   # (K, 4) world ← body
    p: jax.Array   # (K, 3)
    v: jax.Array   # (K, 3)


def preintegrate(
    accel: jax.Array, gyro: jax.Array, dts: jax.Array,
    acc_bias: jax.Array | None = None, gyro_bias: jax.Array | None = None,
) -> ImuDelta:
    """Midpoint preintegration of (N, 3) IMU samples over (N,) intervals."""
    if acc_bias is not None:
        accel = accel - acc_bias
    if gyro_bias is not None:
        gyro = gyro - gyro_bias

    def step(carry, x):
        dq, dv, dp = carry
        a, w, dt = x
        # rotate the accel by the MID-interval attitude: start-of-interval
        # (Euler) rotation biases dv by (ω·dt/2)×a per sample — at 150 °/s
        # + 2.7 g turn dynamics that is 0.34 m/s² of systematic error, which
        # walked the window solve meters off a ground-truth trajectory
        # (≡ the reference's midpoint scheme, adjustPointCloud.cpp:205-276)
        dq_half = se3.quat_mul(dq, se3.so3_exp(w * (0.5 * dt)))
        a_world = se3.quat_rotate(dq_half, a)
        dp = dp + dv * dt + 0.5 * a_world * dt * dt
        dv = dv + a_world * dt
        dq = se3.quat_normalize(se3.quat_mul(dq, se3.so3_exp(w * dt)))
        return (dq, dv, dp), None

    init = (
        jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        jnp.zeros(3, jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
    (dq, dv, dp), _ = jax.lax.scan(
        step, init, (accel, gyro, dts)
    )
    return ImuDelta(dq, dv, dp, jnp.sum(dts))


def gravity_align_init(accel_mean: jax.Array) -> jax.Array:
    """World←body quaternion aligning mean accel with +z gravity
    (≡ Utility::g2R used by trytoinitialize, BackEndSolver.cpp:200-233)."""
    g_body = accel_mean / jnp.maximum(jnp.linalg.norm(accel_mean), 1e-9)
    g_world = jnp.asarray([0.0, 0.0, 1.0], accel_mean.dtype)
    axis = jnp.cross(g_body, g_world)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(g_body, g_world)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-9)
    return se3.so3_exp(axis * angle)


def _imu_residual(state: WindowState, i: int, delta: ImuDelta, g: jax.Array):
    """15-dof → 9-dof residual of the preintegrated factor between i, i+1."""
    qi = state.q[i]
    qj = state.q[i + 1]
    pi, pj = state.p[i], state.p[i + 1]
    vi, vj = state.v[i], state.v[i + 1]
    dt = delta.dt
    qi_inv = se3.quat_conj(qi)

    r_q = se3.so3_log(
        se3.quat_mul(se3.quat_conj(delta.dq), se3.quat_mul(qi_inv, qj))
    )
    r_v = se3.quat_rotate(qi_inv, vj - vi - g * dt) - delta.dv
    r_p = (
        se3.quat_rotate(qi_inv, pj - pi - vi * dt - 0.5 * g * dt * dt)
        - delta.dp
    )
    return jnp.concatenate([r_p, r_q, r_v])


def _between_residual(state: WindowState, i: int, j: int, rel: se3.Pose):
    """Relative-pose factor (≡ addBetweenFactor, BackEndSolver.cpp:351-384)."""
    Ti = se3.Pose(state.q[i], state.p[i])
    Tj = se3.Pose(state.q[j], state.p[j])
    pred = se3.se3_compose(se3.se3_inverse(Ti), Tj)
    return se3.se3_log(se3.se3_compose(se3.se3_inverse(rel), pred))


def _retract(state: WindowState, dx: jax.Array) -> WindowState:
    """dx (K, 9) = (δp, δθ, δv) applied with left-multiplicative rotation."""
    dq = se3.so3_exp(dx[:, 3:6])
    return WindowState(
        q=se3.quat_normalize(se3.quat_mul(dq, state.q)),
        p=state.p + dx[:, :3],
        v=state.v + dx[:, 6:9],
    )


@partial(jax.jit, static_argnames=("n_iters",))
def solve_window(
    state0: WindowState,
    imu_deltas: ImuDelta,          # stacked (K-1, ...)
    odom_rel: se3.Pose,            # stacked (K-1,) relative poses (i → i+1)
    *,
    imu_weight: float = 1.0,
    odom_weight: float = 100.0,
    prior_weight: float = 1e4,
    n_iters: int = 8,
) -> WindowState:
    """GN over the window: IMU + odometry-between factors + prior on state 0."""
    K = state0.q.shape[0]
    g = jnp.asarray([0.0, 0.0, -GRAVITY], jnp.float32)

    def residuals(dx_flat, state):
        st = _retract(state, dx_flat.reshape(K, 9))
        rs = []
        for i in range(K - 1):
            di = jax.tree.map(lambda a: a[i], imu_deltas)
            rs.append(_imu_residual(st, i, di, g) * imu_weight)
            rel = se3.Pose(odom_rel.q[i], odom_rel.t[i])
            rs.append(_between_residual(st, i, i + 1, rel) * odom_weight)
        # prior pins state 0's POSE only (the 6-dof gauge); velocity is
        # observable from IMU + between-factors and must stay free — pinning
        # it to a noisy warm start makes the whole window dead-reckon from a
        # wrong v0 (≈0.3 m/s of odometry noise ⇒ ~0.2 m over the window)
        rs.append(
            jnp.concatenate(
                [st.p[0] - state0.p[0],
                 se3.so3_log(se3.quat_mul(st.q[0], se3.quat_conj(state0.q[0])))]
            )
            * prior_weight
        )
        return jnp.concatenate(rs)

    def cost(state):
        r = residuals(jnp.zeros(K * 9), state)
        return jnp.sum(r * r)

    def step(carry, _):
        state, best, best_cost = carry
        dx0 = jnp.zeros(K * 9)
        r = residuals(dx0, state)
        J = jax.jacfwd(residuals)(dx0, state)
        H = J.T @ J
        gvec = J.T @ r
        damp = 1e-6 * jnp.maximum(jnp.diagonal(H), 1e-8)
        L = jnp.linalg.cholesky(H + jnp.diag(damp))
        dx = jax.scipy.linalg.cho_solve((L, True), -gvec)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        new = _retract(state, dx.reshape(K, 9))
        # best-χ² tracking (≡ LSQNonlinear.hpp:42-48 revert-on-increase;
        # without it a bad linearization on a sharp-turn window can walk the
        # solve tens of meters away and the last iterate is returned anyway)
        c = cost(new)
        better = c < best_cost
        best = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), new, best
        )
        best_cost = jnp.where(better, c, best_cost)
        return (new, best, best_cost), None

    (state, best, best_cost), _ = jax.lax.scan(
        step, (state0, state0, cost(state0)), None, length=n_iters
    )
    return best
