"""Square-root condensed photometric factor (≡ V14/V21:
``TwoFramePhotometricFunction``, ``src/Optimization/FrameTracker.cpp:26-71``
+ ``FrameParameterization``, ``FrameParameterization.cpp:22-46``).

The reference's Basalt-style derivation (the repository's README exercise,
``README.md:65-100``): accumulate the weighted photometric Gauss-Newton
system H = Σ wJJᵀ, b = −Σ wJr over a two-frame patch set, then condense it
into a constant-size 6-dim linear residual by eigendecomposition

    H = U S Uᵀ,   J_lin = S^½ Uᵀ,   r_lin = −S^{−½} Uᵀ b

so that J_linᵀJ_lin = H and the least-squares step of the condensed factor,
argmin_δ |J_lin δ + r_lin|², equals the full system's GN step on the
non-degenerate eigen-subspace (small eigenvalues are zeroed, exactly like
the reference's ``eps`` select). The paired parameterization is the
left-perturbation update Plus(T, δ) = exp(δ)·T whose tangent-space Jacobian
is the [I₆; 0] trick — in this codebase every solver already works in the
tangent space (``se3.se3_compose(se3.se3_exp(δ), T)``), so the
parameterization needs no separate object.

TPU-native role: a **marginalized two-frame photometric constraint** of
fixed (6,6)+(6,) size. Building it touches pixels once; afterwards it can
be re-used across pose-graph GN iterations, stacked with other factors, or
psum'd across a mesh at 168 bytes/factor — the distributed-BA-friendly form
of the direct tracker's per-pixel system.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import se3
from .tracker_direct import _photometric_system


def condense(H: jax.Array, g: jax.Array, eps: float = 1e-8):
    """Square-root condensation (FrameTracker.cpp:38-57).

    H (6, 6) PSD, g (6,) with GN step δ* = H⁺ g. Returns (J_lin (6, 6),
    r_lin (6,)) with J_linᵀ J_lin = H (eps-clamped) and
    argmin |J_lin δ + r_lin|² = δ*.
    """
    w, U = jnp.linalg.eigh((H + H.T) * 0.5)
    ok = w > eps
    s_sqrt = jnp.sqrt(jnp.where(ok, w, 0.0))
    s_inv_sqrt = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(w, eps)), 0.0)
    J_lin = s_sqrt[:, None] * U.T
    r_lin = -s_inv_sqrt * (U.T @ g)
    return J_lin, r_lin


@partial(jax.jit, static_argnames=("tdist_dof",))
def photometric_sqrt_factor(
    T: se3.Pose,
    ref_img: jax.Array,
    cur_img: jax.Array,
    pts_ref: jax.Array,
    mask: jax.Array,
    cam_l,
    tdist_dof: float = 5.0,
):
    """Build the condensed two-frame factor at linearization point ``T``
    (cur ← ref): one pass over the patch set (shared with tracker_direct's
    forward-compositional system), then ``condense``.

    Returns (J_lin, r_lin): the 6-dim linear residual ρ(δ) = J_lin δ + r_lin
    modeling the photometric cost around T under the left-perturbation
    T ← exp(δ)·T.
    """
    r, J, w, _ = _photometric_system(
        T, ref_img, cur_img, pts_ref, mask, cam_l, tdist_dof
    )
    H = jnp.einsum(
        "nd,ndi,ndj->ij", w, J, J, precision=jax.lax.Precision.HIGHEST
    )
    g = -jnp.einsum(
        "nd,ndi,nd->i", w, J, r, precision=jax.lax.Precision.HIGHEST
    )
    return condense(H, g)


def factor_step(J_lin: jax.Array, r_lin: jax.Array, lm_lambda: float = 0.0):
    """GN step of one condensed factor: δ = argmin |J_lin δ + r_lin|².

    With lm_lambda > 0, Levenberg damping on the condensed normal equations
    (identical to damping the full system — JᵀJ is H exactly).
    """
    H = J_lin.T @ J_lin + lm_lambda * jnp.eye(6, dtype=J_lin.dtype)
    g = -J_lin.T @ r_lin
    return jnp.linalg.solve(H, g)


def apply_step(T: se3.Pose, delta: jax.Array) -> se3.Pose:
    """FrameParameterization::Plus — left-multiplicative tangent update
    (FrameParameterization.cpp:22-34). The ComputeJacobian [I₆; 0] trick is
    implicit: factors are built directly in the tangent space."""
    return se3.se3_compose(se3.se3_exp(delta), T)
