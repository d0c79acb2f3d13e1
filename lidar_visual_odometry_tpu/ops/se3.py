"""SO(3)/SE(3) math core for the TPU-native lidar-visual odometry engine.

Provides quaternion-based rotations and SE(3) poses as batched, jit-friendly pure
functions. This is the TPU-first replacement for the reference's custom ``Twist``
SE(3) type (reference: ``include/vloam/Twist.h:59-302``) and its vendored Sophus —
same math (left-perturbation ``exp`` updates, adjoint transport, Taylor-safe
exponentials, full-V-matrix ``se3exp``), but expressed as functions over
``(..., 4)`` / ``(..., 3)`` tensors so every op vmaps/shards for free.

Conventions
-----------
* Quaternions are stored ``(w, x, y, z)`` (scalar first), unit-norm, and act on
  column vectors: ``R(q) v = q * v * conj(q)``.
* A pose is the named tuple ``Pose(q, t)`` meaning ``x_parent = R(q) x_child + t``.
* Twists are ``(..., 6)`` with translational part first: ``xi = (v, omega)``,
  matching the reference's ``se3exp`` layout (``Twist.h:182-204``).
* All functions broadcast over leading batch dimensions.

Everything is dtype-preserving; geometry runs in float32 on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Series switch-over point: below this angle use Taylor expansions
# (mirrors the reference's SMALL_EPS guards, Twist.h:259-288).
_SMALL_ANGLE = 1e-6


class Pose(NamedTuple):
    """SE(3) pose: rotation quaternion (w,x,y,z) and translation.

    ``Pose`` is a NamedTuple, hence automatically a JAX pytree: it can be passed
    through jit/vmap/scan and sharded like any other tensor pair.
    """

    q: jax.Array  # (..., 4) unit quaternion, scalar first
    t: jax.Array  # (..., 3)


def identity_pose(batch_shape=(), dtype=jnp.float32) -> Pose:
    q = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), (*batch_shape, 4)
    )
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(q, t)


# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b for (w,x,y,z) quaternions, broadcasting."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4).

    Uses the 2-cross-product form (15 mul + 15 add per point), cheaper than
    forming R when rotating a single vector; for large point sets prefer
    ``quat_to_matrix`` + matmul so the contraction lands on the MXU.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) (w,x,y,z), branch-free Shepperd's method.

    Computes all four candidate quaternions and selects the numerically best
    (largest pivot) with ``where`` masks instead of data-dependent branches, so
    the op stays a single fused XLA program under vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Candidate 0: pivot on trace.
    s0 = _safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1
    )
    # Candidate 1: pivot on m00.
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1
    )
    # Candidate 2: pivot on m11.
    s2 = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1
    )
    # Candidate 3: pivot on m22.
    s3 = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1
    )

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_slerp_identity(q: jax.Array, s) -> jax.Array:
    """slerp(identity, q, s) — the de-skew interpolation of the reference's
    lidar factors (``src/lidarFactor.hpp:27-29``): fraction ``s`` of rotation q.

    Implemented as exp(s*log(q)), Taylor-safe at q ≈ identity.
    """
    return so3_exp(jnp.asarray(s)[..., None] * so3_log(q))


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix (utility.h:35-43 analog)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack(
        [zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1
    )
    return m.reshape(*w.shape[:-1], 3, 3)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rotation-vector (..., 3) -> unit quaternion (..., 4).

    Taylor-guarded like the reference's ``expAndTheta`` (Twist.h:259-288).
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta_sq < _SMALL_ANGLE
    # "safe where": the untaken exact branch must stay NaN-free under
    # autodiff (d/dw sqrt at 0 → inf, and where() grads flow through BOTH
    # branches), so evaluate it at a clamped theta
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    # sin(x/2)/x — series: 1/2 - x^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector, Taylor-safe, sign-canonicalized."""
    # Canonicalize to w >= 0 so the returned angle is in [0, pi].
    q = jnp.where(q[..., :1] >= 0, q, -q)
    w = q[..., :1]
    v = q[..., 1:]
    vn_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn_sq < _SMALL_ANGLE * _SMALL_ANGLE
    # atan2 formulation is stable everywhere except vn ~ 0; safe-where keeps
    # the untaken branch NaN-free under autodiff
    safe_vn = jnp.sqrt(jnp.where(small, 1.0, vn_sq))
    angle_over_vn = jnp.where(
        small,
        2.0 / jnp.maximum(w, 1e-12),  # series: 2/w - 2 vn^2/(3 w^3) ~ 2
        2.0 * jnp.arctan2(safe_vn, w) / safe_vn,
    )
    return angle_over_vn * v


# ---------------------------------------------------------------------------
# SE(3) exp/log/compose
# ---------------------------------------------------------------------------


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V matrix of se3 exp: V = I + (1-cos θ)/θ² W + (θ-sin θ)/θ³ W²."""
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta_sq < _SMALL_ANGLE
    safe_sq = jnp.where(small, 1.0, theta_sq)   # NaN-free untaken branch
    theta = jnp.sqrt(safe_sq)
    W = so3_hat(w)
    W2 = W @ W
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """V^{-1} closed form (used by se3_log)."""
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta_sq < _SMALL_ANGLE
    safe_sq = jnp.where(small, 1.0, theta_sq)   # NaN-free untaken branch
    theta = jnp.sqrt(safe_sq)
    W = so3_hat(w)
    W2 = W @ W
    half = 0.5 * theta
    # (1 - θ/2 · cot(θ/2)) / θ²  — series 1/12 + θ²/720
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-24)) / safe_sq,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term * W2


def se3_exp(xi: jax.Array) -> Pose:
    """Twist (..., 6) = (v, omega) -> Pose, with the full V matrix
    (reference semantics: ``Twist.h:182-204`` se3exp)."""
    v = xi[..., :3]
    w = xi[..., 3:]
    q = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return Pose(q, t)


def se3_log(pose: Pose) -> jax.Array:
    w = so3_log(pose.q)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, pose.t)
    return jnp.concatenate([v, w], axis=-1)


def so3t_exp(xi: jax.Array) -> Pose:
    """Decoupled rot/trans exponential — the reference's ``so3Transexp``
    (Twist.h:206-215): translation taken verbatim, no V matrix."""
    return Pose(so3_exp(xi[..., 3:]), xi[..., :3])


def se3_compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a)."""
    return Pose(
        quat_normalize(quat_mul(a.q, b.q)),
        quat_rotate(a.q, b.t) + a.t,
    )


def se3_inverse(p: Pose) -> Pose:
    qinv = quat_conj(p.q)
    return Pose(qinv, -quat_rotate(qinv, p.t))


def se3_apply(p: Pose, x: jax.Array) -> jax.Array:
    """Apply pose to points (..., 3). For big clouds use se3_apply_matmul."""
    return quat_rotate(p.q, x) + p.t


def se3_apply_matmul(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply a single pose to an (N, 3) cloud via R-matmul — lands on the MXU
    (replaces pcl::transformPointCloud, CamLidarProcess.cpp:253).

    precision=HIGHEST: TPU f32 matmul defaults to bf16 MXU passes, which at
    lidar ranges (±80 m) costs centimeters of coordinate error — geometry
    transforms must run the full-precision path.
    """
    R = quat_to_matrix(p.q)
    return (
        jax.lax.dot_general(
            pts, R,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        + p.t
    )


def se3_adjoint(p: Pose) -> jax.Array:
    """(..., 6, 6) adjoint in (v, omega) ordering: Ad = [[R, t^ R], [0, R]].

    Matches the reference ``SE3Adj`` (Twist.h:156-167) used to transport
    photometric Jacobians between frames (Tracker2.cpp:335-344).
    """
    R = quat_to_matrix(p.q)
    tR = so3_hat(p.t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_matrix(p: Pose) -> jax.Array:
    """Pose -> (..., 4, 4) homogeneous matrix."""
    R = quat_to_matrix(p.q)
    top = jnp.concatenate([R, p.t[..., :, None]], axis=-1)
    bottom_row = jnp.concatenate(
        [
            jnp.zeros((*p.t.shape[:-1], 1, 3), dtype=p.t.dtype),
            jnp.ones((*p.t.shape[:-1], 1, 1), dtype=p.t.dtype),
        ],
        axis=-1,
    )
    return jnp.concatenate([top, bottom_row], axis=-2)


def se3_from_matrix(T: jax.Array) -> Pose:
    return Pose(matrix_to_quat(T[..., :3, :3]), T[..., :3, 3])


def quat_to_ypr(q: jax.Array) -> jax.Array:
    """(..., 4) → (yaw, pitch, roll) in radians, ZYX convention
    (≡ Utility::R2ypr, include/aloam_velodyne/utility.h:77-96)."""
    R = quat_to_matrix(q)
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def ypr_to_quat(ypr: jax.Array) -> jax.Array:
    """(yaw, pitch, roll) → quaternion, ZYX (≡ Utility::ypr2R)."""
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    zeros = jnp.zeros_like(y)
    qz = so3_exp(jnp.stack([zeros, zeros, y], axis=-1))
    qy = so3_exp(jnp.stack([zeros, p, zeros], axis=-1))
    qx = so3_exp(jnp.stack([r, zeros, zeros], axis=-1))
    return quat_mul(qz, quat_mul(qy, qx))


def pose_interpolate(p: Pose, s) -> Pose:
    """Fractional pose exp(s·log): quaternion slerp-from-identity + s·t.

    This is exactly the de-skew used by the lidar factors
    (``lidarFactor.hpp:27-30``: slerp for q, linear for t).
    """
    s = jnp.asarray(s)
    return Pose(quat_slerp_identity(p.q, s), s[..., None] * p.t)
