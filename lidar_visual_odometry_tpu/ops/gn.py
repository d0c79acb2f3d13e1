"""On-device Gauss-Newton machinery.

Replaces Ceres (DENSE_QR, Huber loss, 4 inner iterations —
``laserOdometry.cpp:570-575``) and the reference's templated GN/LM driver
(``include/vloam/LSQNonlinear.hpp:20-194``) with batched tensor assembly:
residual blocks contribute ``H = Σ wᵢ JᵢᵀJᵢ``, ``g = Σ wᵢ Jᵢᵀrᵢ`` via einsum
(MXU), and the 6×6 (or D×D) normal equations solve with a damped Cholesky.

Iteration counts are static (`lax.scan`) — XLA requirement, and faithful to
the reference's fixed schedules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def huber_weight(r_norm: jax.Array, delta: float) -> jax.Array:
    """IRLS weight of the Huber loss ρ'(r): 1 inside δ, δ/|r| outside
    (≡ ceres::HuberLoss(0.1), laserOdometry.cpp:369)."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


def tdist_weight(r: jax.Array, sigma: jax.Array, dof: float = 5.0) -> jax.Array:
    """Student-t weight (ν+1)/(ν+(r/σ)²) (≡ WeightFunction.cpp:91-95)."""
    x2 = (r / jnp.maximum(sigma, 1e-12)) ** 2
    return (dof + 1.0) / (dof + x2)


def accumulate(r: jax.Array, J: jax.Array, w: jax.Array, mask: jax.Array):
    """Blockwise H, g from (N, D) residuals, (N, D, 6) Jacobians, (N,) weights.

    Returns (H (6,6), g (6,)) for ``H δ = −g``. Masked rows contribute zero.
    """
    wm = (w * mask).astype(r.dtype)[..., None, None]
    Jw = J * wm
    H = jnp.einsum(
        "ndi,ndj->ij", Jw, J, precision=jax.lax.Precision.HIGHEST
    )
    g = jnp.einsum(
        "ndi,nd->i", Jw, r, precision=jax.lax.Precision.HIGHEST
    )
    return H, g


def solve_damped(H: jax.Array, g: jax.Array, lm_lambda: float = 1e-4) -> jax.Array:
    """δ = −(H + λ·diag(H))⁻¹ g via Cholesky, NaN-guarded to zero step.

    Levenberg damping proportional to diag(H) keeps the step well-conditioned
    in f32 (the reference solves in f64; TPU prefers f32 + damping)."""
    d = H.shape[-1]
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    damp = lm_lambda * jnp.maximum(diag, 1e-6)
    Hd = H + jnp.eye(d, dtype=H.dtype) * damp[..., None, :]
    L = jnp.linalg.cholesky(Hd)
    delta = jax.scipy.linalg.cho_solve((L, True), -g)
    bad = ~jnp.all(jnp.isfinite(delta), axis=-1, keepdims=True)
    return jnp.where(bad, 0.0, delta)


def gn_update_pose(pose: se3.Pose, delta: jax.Array) -> se3.Pose:
    """Left-multiplicative update: q ← exp(δθ) q (normalized), t ← t + δt."""
    dq = se3.so3_exp(delta[..., 3:])
    return se3.Pose(
        se3.quat_normalize(se3.quat_mul(dq, pose.q)),
        pose.t + delta[..., :3],
    )
