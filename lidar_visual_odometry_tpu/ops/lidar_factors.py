"""Point-to-line / point-to-plane residuals with analytic Jacobians.

TPU-native equivalent of the reference's Ceres autodiff costs
(``src/lidarFactor.hpp``): instead of per-residual autodiff functors, residuals
and their 6-dof Jacobians are computed for *all* correspondences at once as
batched tensor ops, ready for `H = Jᵀ W J` assembly on the MXU.

Pose convention: ``T = (q, t)`` maps current-frame points into the last frame,
``y = R(q) x + t`` — exactly the reference's ``q_last_curr/t_last_curr``
(``laserOdometry.cpp:131-134``). The GN update is left-multiplicative:
``q ← exp(δθ) q``, ``t ← t + δt``, with twists ordered ``(δt, δθ)``.

Jacobian of the transformed point w.r.t. the twist: ``∂y/∂δt = I``,
``∂y/∂δθ = −[R x]×`` (standard left-perturbation; the "Basalt-style"
derivation the reference README documents, ``README.md:65-100``).

Motion de-skew (per-point fractional pose, ``lidarFactor.hpp:27-30``) is
supported by scaling the twist by each point's relative scan time ``s``;
the shipped reference disables it (``DISTORTION 0``, ``laserOdometry.cpp:66``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3


class EdgeCorr(NamedTuple):
    """Corner correspondences: current point ↔ line (a, b) in last frame."""

    p: jax.Array     # (N, 3) current-frame corner points
    a: jax.Array     # (N, 3) line endpoint 1 (last frame)
    b: jax.Array     # (N, 3) line endpoint 2
    s: jax.Array     # (N,)   de-skew fraction (1.0 when disabled)
    mask: jax.Array  # (N,)


class PlaneCorr(NamedTuple):
    """Surf correspondences: current point ↔ plane (j, l, m) in last frame."""

    p: jax.Array
    j: jax.Array
    l: jax.Array
    m: jax.Array
    s: jax.Array
    mask: jax.Array


class NormPlaneCorr(NamedTuple):
    """Surf ↔ fitted plane (unit normal n, offset d): r = n·y + d
    (≡ LidarPlaneNormFactor, lidarFactor.hpp:106-138)."""

    p: jax.Array     # (N, 3)
    n: jax.Array     # (N, 3) unit normals
    d: jax.Array     # (N,)
    mask: jax.Array


def _transform_deskewed(pose: se3.Pose, p: jax.Array, s: jax.Array) -> jax.Array:
    """y = slerp(I, q, s)·p + s·t  (TransformToStart, laserOdometry.cpp:154-172)."""
    ps = se3.pose_interpolate(pose, s)
    return se3.quat_rotate(ps.q, p) + ps.t


def edge_residuals(
    pose: se3.Pose, c: EdgeCorr
) -> tuple[jax.Array, jax.Array]:
    """Point-to-line residual r = (y−a)×(y−b)/|a−b| (dim 3) + Jacobian (3, 6).

    ∂r/∂y = [b−a]× / |a−b|;  ∂y/∂ξ = [ s·I | −s·[Rp]× ].
    """
    y = _transform_deskewed(pose, c.p, c.s)
    u = y - c.a
    v = y - c.b
    ab = c.a - c.b
    denom = jnp.linalg.norm(ab, axis=-1, keepdims=True)
    denom = jnp.maximum(denom, 1e-9)
    r = jnp.cross(u, v) / denom

    dr_dy = se3.so3_hat(-ab) / denom[..., None]        # [b−a]× / |a−b|
    Rp = y - c.s[..., None] * pose.t                    # s-interpolated R p
    dy_dxi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*y.shape[:-1], 3, 3)),
            -se3.so3_hat(Rp),
        ],
        axis=-1,
    ) * c.s[..., None, None]
    J = dr_dy @ dy_dxi                                  # (N, 3, 6)
    return r, J


def plane_residuals(
    pose: se3.Pose, c: PlaneCorr
) -> tuple[jax.Array, jax.Array]:
    """Point-to-plane r = (y−j)·n, n = normalize((j−l)×(j−m)) (dim 1), J (1, 6)."""
    n = jnp.cross(c.j - c.l, c.j - c.m)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    y = _transform_deskewed(pose, c.p, c.s)
    r = jnp.sum((y - c.j) * n, axis=-1, keepdims=True)   # (N, 1)

    Rp = y - c.s[..., None] * pose.t
    # ∂r/∂ξ = nᵀ [ I | −[Rp]× ] · s
    J_t = n
    J_w = jnp.cross(Rp, n)   # nᵀ(−[Rp]×) = (Rp × n)ᵀ
    J = jnp.concatenate([J_t, J_w], axis=-1) * c.s[..., None]
    return r, J[..., None, :]


def norm_plane_residuals(
    pose: se3.Pose, c: NormPlaneCorr
) -> tuple[jax.Array, jax.Array]:
    """Fitted-plane residual r = n·(R p + t) + d (mapping solver form)."""
    y = se3.se3_apply(pose, c.p)
    r = jnp.sum(y * c.n, axis=-1, keepdims=True) + c.d[..., None]  # (N, 1)
    Rp = y - pose.t
    J = jnp.concatenate([c.n, jnp.cross(Rp, c.n)], axis=-1)
    return r, J[..., None, :]


def point_residuals(
    pose: se3.Pose, p: jax.Array, target: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Point-to-point r = R p + t − target (≡ LidarDistanceFactor)."""
    y = se3.se3_apply(pose, p)
    r = y - target
    Rp = y - pose.t
    J = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*y.shape[:-1], 3, 3)),
            -se3.so3_hat(Rp),
        ],
        axis=-1,
    )
    return r, J
