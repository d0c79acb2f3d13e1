"""Batched geometric fits for scan-to-map association.

TPU-native replacements for the per-point Eigen solves in laserMapping:

* ``line_fit`` ≡ 5-NN PCA line fit (``laserMapping.cpp:582-621``):
  covariance eigendecomposition, accept when the dominant eigenvalue is 3×
  the runner-up, line direction = dominant eigenvector.
* ``plane_fit`` ≡ 5-NN plane fit by solving ``A·n = −1`` (``:648-687``),
  with the 0.2 m planarity residual gate.

Both are closed-form (Cardano eigenvalues, cross-product eigenvectors, adjugate
3×3 solve) so they vmap over tens of thousands of neighborhoods as pure VPU
work — no iterative LAPACK loops, which lower poorly on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigenvalues (ascending) + eigenvectors of symmetric (..., 3, 3).

    Analytic: Cardano's trigonometric formula for eigenvalues; eigenvectors by
    cross products of (A − λI) rows (the two most independent rows). Matches
    jnp.linalg.eigh to ~1e-5 for well-conditioned inputs; degenerate (repeated
    eigenvalue) cases return *an* orthonormal basis, adequate for the
    λ_max > 3·λ_mid acceptance gate.
    """
    dtype = A.dtype
    # Shift by trace/3 for numerical robustness
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    A_sh = A - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(A_sh * A_sh, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = A_sh / p[..., None, None]
    detB = jnp.linalg.det(B)
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    # eigenvalues of B: 2cos(phi), 2cos(phi - 2pi/3), 2cos(phi + 2pi/3)
    e1 = 2.0 * jnp.cos(phi)
    e2 = 2.0 * jnp.cos(phi - 2.0 * jnp.pi / 3.0)
    e3 = 2.0 * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lams = q[..., None] + p[..., None] * jnp.stack([e3, e2, e1], axis=-1)
    lams = jnp.sort(lams, axis=-1)  # ascending

    def eigvec(lam):
        M = A - lam[..., None, None] * jnp.eye(3, dtype=dtype)
        # candidate vectors: cross products of row pairs
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        v = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                      jnp.where(n02 >= n12, c02, c12))
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # degenerate fallback: unit x
        unit = jnp.zeros_like(v).at[..., 0].set(1.0)
        return jnp.where(nrm > 1e-12, v / jnp.maximum(nrm, 1e-12), unit)

    vecs = jnp.stack(
        [eigvec(lams[..., 0]), eigvec(lams[..., 1]), eigvec(lams[..., 2])],
        axis=-1,
    )  # columns are eigenvectors
    return lams, vecs


def solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Closed-form (..., 3, 3) @ x = (..., 3) via adjugate/determinant."""
    det = jnp.linalg.det(A)
    # Cramer's rule, batched
    def repl(i):
        Ai = A.at[..., :, i].set(b)
        return jnp.linalg.det(Ai)

    x = jnp.stack([repl(0), repl(1), repl(2)], axis=-1)
    safe = jnp.abs(det) > 1e-12
    return jnp.where(
        safe[..., None], x / jnp.where(safe, det, 1.0)[..., None], 0.0
    )


def line_fit(
    nbrs: jax.Array, nbr_mask: jax.Array, *, eig_ratio: float = 3.0
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PCA line fit over (..., K, 3) neighborhoods.

    Returns (centroid (..., 3), direction (..., 3) unit, ok (...,) bool) with
    ok = all K valid & λ_max > eig_ratio · λ_mid (laserMapping.cpp:607).
    """
    w = nbr_mask[..., None].astype(nbrs.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    centroid = jnp.sum(nbrs * w, axis=-2) / cnt
    d = (nbrs - centroid[..., None, :]) * w
    cov = jnp.einsum("...ki,...kj->...ij", d, d) / cnt[..., None]
    lams, vecs = eigh3x3(cov)
    direction = vecs[..., :, 2]  # dominant eigenvector
    ok = jnp.all(nbr_mask, axis=-1) & (
        lams[..., 2] > eig_ratio * jnp.maximum(lams[..., 1], 0.0)
    )
    return centroid, direction, ok


def plane_fit(
    nbrs: jax.Array, nbr_mask: jax.Array, *, tol: float = 0.2
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fit n·p + d = 0 with |n| = 1 by solving A·m = −1 over (..., K, 3).

    Returns (n unit normal, d offset, ok) with ok = all K valid & every
    neighbor within ``tol`` of the plane (laserMapping.cpp:665-675).
    """
    w = nbr_mask[..., None].astype(nbrs.dtype)
    Aw = nbrs * w
    AtA = jnp.einsum("...ki,...kj->...ij", Aw, nbrs * w)
    Atb = jnp.sum(Aw * -1.0, axis=-2)
    m = solve3x3(AtA, Atb)
    norm = jnp.linalg.norm(m, axis=-1, keepdims=True)
    n = m / jnp.maximum(norm, 1e-12)
    dist = 1.0 / jnp.maximum(norm[..., 0], 1e-12)
    resid = jnp.abs(
        jnp.einsum("...ki,...i->...k", nbrs, n) + dist[..., None]
    )
    ok = (
        jnp.all(nbr_mask, axis=-1)
        & (norm[..., 0] > 1e-12)
        & jnp.all(jnp.where(nbr_mask, resid, 0.0) <= tol, axis=-1)
    )
    return n, dist, ok
