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


def tdist_scale(
    r: jax.Array,
    mask: jax.Array,
    *,
    dof: float = 5.0,
    init_sigma: float = 5.0,
    iters: int = 10,
) -> jax.Array:
    """Student-t scale by fixed-point iteration (≡ the reference's
    ``TDistributionScaleEstimator``, ``WeightFunction.cpp:20-78``):

        σ² ← mean_i [ (ν+1)/(ν + (rᵢ/σ)²) · rᵢ² ]

    iterated to convergence. The reference loops until |σ²−σ²_prev|<1e-6;
    a fixed `iters` scan converges well past that on real residual sets
    (contraction is geometric) and keeps the jaxpr static.
    """
    m = mask.astype(r.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    r2 = r * r

    def body(sigma2, _):
        w = (dof + 1.0) / (dof + r2 / jnp.maximum(sigma2, 1e-12))
        sigma2 = (w * r2 * m).sum() / n
        return jnp.maximum(sigma2, 1e-12), None

    sigma2, _ = jax.lax.scan(
        body, jnp.asarray(init_sigma**2, r.dtype), None, length=iters
    )
    return jnp.sqrt(sigma2)


def lm_optimize(build_system, update, apply_delta, x0, *, iters: int = 10,
                tau: float = 1e-2):
    """Levenberg-Marquardt with the ρ-gain trust-region schedule of the
    reference's ``LSQNonlinearLevenbergMarquardt`` (``LSQNonlinear.hpp:84-194``):

    * damping μ·diag(H), μ₀ = τ·max(diag H),
    * gain ratio ρ = (χ²_old − χ²_new) / (δᵀ(μ·D·δ + g)),
    * accept if ρ>0: μ ← μ·max(⅓, 1−(2ρ−1)³), ν ← 2,
    * reject: revert x, μ ← μ·ν, ν ← 2ν.

    ``build_system(x) -> (H, g, chi2)`` with the −g convention of
    :func:`solve_damped`; ``update(x, δ) -> x_new``; ``apply_delta`` unused
    hook kept for parity with GN drivers. Fixed `iters` via ``lax.scan``
    (rejected steps consume an iteration, like any trust-region loop).
    Returns (x, final chi²).
    """
    del apply_delta
    H0, g0, chi0 = build_system(x0)
    d = g0.shape[-1]
    mu0 = tau * jnp.max(jnp.diagonal(H0))

    def step(carry, _):
        x, mu, nu, chi = carry
        H, g, _ = build_system(x)
        D = jnp.diagonal(H)
        Hd = H + jnp.eye(d, dtype=H.dtype) * (mu * jnp.maximum(D, 1e-6))
        L = jnp.linalg.cholesky(Hd)
        delta = jax.scipy.linalg.cho_solve((L, True), -g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)
        x_new = update(x, delta)
        _, _, chi_new = build_system(x_new)
        # predicted decrease ½δᵀ(μDδ − g); reference LSQNonlinear.hpp:141-147
        pred = 0.5 * jnp.dot(delta, mu * jnp.maximum(D, 1e-6) * delta - g)
        rho = (chi - chi_new) / jnp.maximum(pred, 1e-12)
        accept = rho > 0.0
        mu_acc = mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        x = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), x_new, x
        )
        chi = jnp.where(accept, chi_new, chi)
        mu = jnp.where(accept, mu_acc, mu * nu)
        nu = jnp.where(accept, 2.0, 2.0 * nu)
        return (x, mu, nu, chi), None

    (x, _, _, chi), _ = jax.lax.scan(
        step, (x0, mu0, jnp.asarray(2.0, g0.dtype), chi0), None, length=iters
    )
    return x, chi
