"""Direct photometric tracker (≡ Tracker2, the dedvo-style dense VO).

Coarse-to-fine photometric alignment of the current frame against a reference
keyframe (``src/vloam/Tracker2.cpp:60-360``): per pyramid level, the
keyframe's gradient-selected points project into the current image with a
4-pixel patch pattern {(1,−1),(1,1),(−1,−1),(−1,1)} (``Tracker2.h:41-44``);
residuals are photometric differences with a per-level affine brightness
offset and Student-t weights on MAD-normalized errors
(``compute_residuals``, ``:197-306``; ``WeightFunction.cpp:20-95``); the 6-dof
Gauss-Newton updates left-multiplicatively ``T ← exp(δ)·T`` (``:83-106``).

Formulation note: the reference precomputes reference-image Jacobians and
transports H with the adjoint (``:335-344``, inverse-compositional flavor);
this implementation evaluates gradients in the *current* image
(forward-compositional) — same fixed point, one fused gather per iteration,
and no adjoint transport needed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import gn, image, se3
from .keyframe import Keyframe

# 4-pixel sparse patch (Tracker2.h:41-44); numpy so importing the module
# never eagerly initializes a JAX backend
PATCH = np.asarray(
    [[1.0, -1.0], [1.0, 1.0], [-1.0, -1.0], [-1.0, 1.0]], np.float32
)


def _level_cam(cam, level: int):
    s = 0.5 ** level
    return cam._replace(
        fx=cam.fx * s, fy=cam.fy * s, cx=cam.cx * s, cy=cam.cy * s,
        width=int(cam.width * s), height=int(cam.height * s),
    )


def _sample3(img: jax.Array, gx: jax.Array, gy: jax.Array, uv: jax.Array,
             precision=jax.lax.Precision.HIGH):
    """Sample (image, x-grad, y-grad) at shared coords.

    TPU: one gather-free one-hot MXU contraction for all three channels
    (XLA gathers serialize on TPU — the round-2 direct-VO path spent most
    of its 160 ms/frame in them); CPU: plain 4-tap gathers (fast there).
    ``precision`` tunes the MXU pass count: HIGH = bf16x3 (default);
    DEFAULT = single-pass bf16 — 3× cheaper on the MXU-bound window-BA
    sampler, ~0.4% relative sample noise (see window_ba).
    """
    if jax.default_backend() == "tpu":
        s = image.bilinear_mxu(jnp.stack([img, gx, gy]), uv,
                               precision=precision)
        return s[0], s[1], s[2]
    return (
        image.bilinear(img, uv),
        image.bilinear(gx, uv),
        image.bilinear(gy, uv),
    )


def _sample1(img: jax.Array, uv: jax.Array,
             precision=jax.lax.Precision.HIGH) -> jax.Array:
    if jax.default_backend() == "tpu":
        return image.bilinear_mxu(img[None], uv, precision=precision)[0]
    return image.bilinear(img, uv)


def _ref_samples(
    ref_img: jax.Array, pts_ref: jax.Array, mask: jax.Array, cam_l
):
    """Pose-independent reference-side samples — hoisted out of the GN
    iteration loop (they were recomputed every iteration in round 2)."""
    uv_ref, front_ref = cam_ops.project(cam_l, pts_ref)
    i_ref = _sample1(ref_img, uv_ref[:, None, :] + PATCH[None])   # (N, 4)
    ok_ref = (
        mask & front_ref & cam_ops.is_in_image(cam_l, uv_ref, boundary=2.0)
    )
    return i_ref, ok_ref


def _photometric_system_pre(
    T: se3.Pose,
    i_ref: jax.Array,          # (N, 4) hoisted reference samples
    ok_ref: jax.Array,         # (N,) hoisted reference validity
    cur_img: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    pts_ref: jax.Array,
    cam_l,
    tdist_dof: float,
):
    """Residuals r (N, 4), Jacobians J (N, 4, 6), validity (N,) at one level."""
    p_cur = se3.se3_apply(T, pts_ref)
    uv_cur, front_cur = cam_ops.project(cam_l, p_cur)
    patch_cur = uv_cur[:, None, :] + PATCH[None]
    i_cur, gxs, gys = _sample3(cur_img, gx, gy, patch_cur)     # (N, 4) each

    z = p_cur[..., 2]
    safe_z = jnp.maximum(z, 1e-3)
    inv_z = 1.0 / safe_z
    # ∂uv/∂p (pinhole, no distortion at tracking time — KITTI is rectified)
    # du/dp = fx·(1/z, 0, −x/z²), dv/dp = fy·(0, 1/z, −y/z²)
    du = jnp.stack(
        [cam_l.fx * inv_z, jnp.zeros_like(z), -cam_l.fx * p_cur[..., 0] * inv_z * inv_z],
        axis=-1,
    )
    dv = jnp.stack(
        [jnp.zeros_like(z), cam_l.fy * inv_z, -cam_l.fy * p_cur[..., 1] * inv_z * inv_z],
        axis=-1,
    )
    # ∂p/∂ξ = [I | −[p]×] (left perturbation)
    dp = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=z.dtype), (*z.shape, 3, 3)),
            -se3.so3_hat(p_cur),
        ],
        axis=-1,
    )                                                          # (N, 3, 6)
    duv_dxi_u = jnp.einsum("ni,nij->nj", du, dp)               # (N, 6)
    duv_dxi_v = jnp.einsum("ni,nij->nj", dv, dp)
    J = gxs[..., None] * duv_dxi_u[:, None, :] + gys[..., None] * duv_dxi_v[:, None, :]

    r = i_cur - i_ref
    ok = (
        ok_ref
        & front_cur
        & cam_ops.is_in_image(cam_l, uv_cur, boundary=2.0)
        & (z > 0.1)
    )
    # affine brightness offset (per-level b of Tracker2.cpp:235-273)
    w_ok = ok[:, None].astype(r.dtype)
    b = jnp.sum(r * w_ok) / jnp.maximum(jnp.sum(w_ok) * 4.0, 1.0)
    r = r - b

    # Student-t weights on MAD-normalized residuals. nanmedian lowers to a
    # full sort on TPU, but at 8k elements that sort costs ~8 µs — a
    # value-domain bisection loop was MEASURED 7× slower here (while-loop
    # step overhead dominates small reductions; see gn.masked_median_bisect's
    # removal in the round-3 log) — keep the sort.
    absr = jnp.abs(jnp.where(ok[:, None], r, jnp.nan))
    med = jnp.nanmedian(absr)
    sigma = jnp.maximum(1.4826 * med, 1e-4)
    w = gn.tdist_weight(r, sigma, tdist_dof) * w_ok
    return r, J, w, ok


def _photometric_system(
    T: se3.Pose,
    ref_img: jax.Array,
    cur_img: jax.Array,
    pts_ref: jax.Array,
    mask: jax.Array,
    cam_l,
    tdist_dof: float,
):
    """One-shot convenience (sqrt factor / tests): hoists nothing."""
    i_ref, ok_ref = _ref_samples(ref_img, pts_ref, mask, cam_l)
    gx, gy = image.gradients(cur_img)
    return _photometric_system_pre(
        T, i_ref, ok_ref, cur_img, gx, gy, pts_ref, cam_l, tdist_dof
    )


@partial(jax.jit, static_argnames=("levels", "iters_per_level", "tdist_dof",
                                   "step_tol"))
def track(
    ref_kf: Keyframe,
    cur_pyr: tuple,
    cam,
    T_init: se3.Pose,
    *,
    levels: int = 4,
    iters_per_level: int = 10,
    tdist_dof: float = 5.0,
    step_tol: float = 1e-5,
) -> se3.Pose:
    """Estimate T (cur ← ref keyframe) coarse-to-fine (Tracker2::tracking).

    Each level's GN runs as an early-exit ``while_loop``: out when the
    max-norm of the step drops below ``step_tol`` — the reference solver's
    own convergence test (``LSQNonlinear.hpp:56-60`` ``norm_max(x_) <
    eps_``) — or after ``iters_per_level`` iterations. Warm-started smooth
    frames converge in 2-4 iterations; ``step_tol=0`` restores the
    fixed-trip schedule."""
    T = T_init
    for lvl in range(levels - 1, -1, -1):
        cam_l = _level_cam(cam, lvl)
        ref_img = ref_kf.pyramid[lvl]
        cur_img = cur_pyr[lvl]
        # per-level invariants: reference samples + current-image gradients
        # (pose-independent — computing them inside the GN body paid 1 extra
        # sample pass + 2 gradient images per iteration)
        i_ref, ok_ref = _ref_samples(
            ref_img, ref_kf.points, ref_kf.point_mask, cam_l
        )
        gx, gy = image.gradients(cur_img)

        def gn_step(T):
            r, J, w, ok = _photometric_system_pre(
                T, i_ref, ok_ref, cur_img, gx, gy, ref_kf.points,
                cam_l, tdist_dof,
            )
            H = jnp.einsum(
                "nd,ndi,ndj->ij", w, J, J,
                precision=jax.lax.Precision.HIGHEST,
            )
            g = jnp.einsum(
                "nd,ndi,nd->i", w, J, r,
                precision=jax.lax.Precision.HIGHEST,
            )
            delta = gn.solve_damped(H, g, lm_lambda=1e-4)
            # left-multiplicative update T ← exp(δ)·T (Tracker2.cpp:90)
            dT = se3.se3_exp(delta)
            return se3.se3_compose(dT, T), delta

        if step_tol > 0.0:
            def cond(carry):
                _, i, dmax = carry
                return (i < iters_per_level) & (dmax >= step_tol)

            def body(carry):
                T, i, _ = carry
                T2, delta = gn_step(T)
                return T2, i + 1, jnp.max(jnp.abs(delta))

            T, _, _ = jax.lax.while_loop(
                cond, body, (T, jnp.int32(0), jnp.float32(jnp.inf))
            )
        else:
            T, _ = jax.lax.scan(
                lambda T, _: (gn_step(T)[0], None), T, None,
                length=iters_per_level,
            )
    return T
