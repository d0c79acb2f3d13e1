"""Sliding-window photometric bundle adjustment (≡ WindowOptimizer).

Multi-view photometric BA over the N-keyframe window
(``src/vloam/WindowOptimizer.cpp:20-603``): all ordered (host, target) pairs
h≠t (``:496-520``) contribute 4-pixel-patch photometric residuals of the host
keyframe's points projected into the target frame. Jacobians w.r.t. BOTH
world poses use the left-perturbation identity the reference derives
(``compute_residuals`` ``:352-486``): with ``p_w`` the world point and ``R_t``
the target rotation,

    J_host  = ∇I · ∂π/∂p_t · R_tᵀ · [ I | −[p_w]× ]
    J_target = −J_host                                  (``:444-449``)

so each pair's contribution to the (6N × 6N) Hessian is the rank-structured
block pattern  [[A, −A], [−A, A]]  scattered at (h, t) — assembled here with
one vmap over the static pair list + index_add (``:563-600``). Weights are
globally MAD-normalized Student-t (``build_LinearSystem`` ``:522-560``); the
TBB parallel_for over points (``:401-437``) is just the vmap batch dimension
on TPU. Gauge freedom is fixed by a large diagonal prior on pose 0
(``solve`` ``:180-181``), and the refine loop keeps the best (lowest-χ²)
iterate, matching the reference's revert-on-increase behavior
(``refine`` ``:68-148``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import gn, image, se3
from .tracker_direct import PATCH, _level_cam, _sample1, _sample3

GAUGE_PRIOR = 1e8


def _pair_ref_samples(
    pyr_imgs: jax.Array,      # (K, H, W) one level
    points: jax.Array,        # (K, P, 3)
    point_mask: jax.Array,    # (K, P)
    h: jax.Array,
    cam_l,
    precision=jax.lax.Precision.HIGH,
):
    """Host-side samples + validity for one pair — pose-INDEPENDENT (the
    host keyframe's points are in its own camera frame), so computed once
    per ``refine`` instead of once per pair per GN iteration (round 2 spent
    ~25% of BA sampling re-reading them)."""
    pts_h = points[h]
    uv_h, front_h = cam_ops.project(cam_l, pts_h)
    i_ref = _sample1(pyr_imgs[h], uv_h[:, None, :] + PATCH[None],
                     precision=precision)
    ok_h = (
        point_mask[h]
        & front_h
        & cam_ops.is_in_image(cam_l, uv_h, boundary=2.0)
    )
    return i_ref, ok_h


def _pair_residuals(
    pyr_imgs: jax.Array,      # (K, H, W) one level
    grads: tuple,             # (gx, gy) each (K, H, W) — hoisted
    i_ref: jax.Array,         # (P, 4) hoisted host samples
    ok_h: jax.Array,          # (P,) hoisted host validity
    points: jax.Array,        # (K, P, 3)
    poses: se3.Pose,          # (K,)
    h: jax.Array,
    t: jax.Array,
    cam_l,
    precision=jax.lax.Precision.HIGH,
):
    """Residuals + host-side Jacobian for one (host, target) pair."""
    pts_h = points[h]
    pose_h = se3.Pose(poses.q[h], poses.t[h])
    pose_t = se3.Pose(poses.q[t], poses.t[t])

    p_w = se3.se3_apply(pose_h, pts_h)
    T_tw = se3.se3_inverse(pose_t)
    p_t = se3.se3_apply(T_tw, p_w)

    uv_t, front_t = cam_ops.project(cam_l, p_t)

    gx, gy = grads
    patch_t = uv_t[:, None, :] + PATCH[None]
    i_cur, gxs, gys = _sample3(pyr_imgs[t], gx[t], gy[t], patch_t,
                               precision=precision)
    r = i_cur - i_ref                                          # (P, 4)

    z = jnp.maximum(p_t[..., 2], 1e-3)
    inv_z = 1.0 / z
    du = jnp.stack(
        [cam_l.fx * inv_z, jnp.zeros_like(z), -cam_l.fx * p_t[..., 0] * inv_z**2],
        axis=-1,
    )
    dv = jnp.stack(
        [jnp.zeros_like(z), cam_l.fy * inv_z, -cam_l.fy * p_t[..., 1] * inv_z**2],
        axis=-1,
    )
    # ∂p_t/∂δ_host = R_tᵀ [I | −[p_w]×]
    Rt = se3.quat_to_matrix(T_tw.q)
    dp_w = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=z.dtype), (*z.shape, 3, 3)),
            -se3.so3_hat(p_w),
        ],
        axis=-1,
    )                                                          # (P, 3, 6)
    dpt = jnp.einsum("ij,njk->nik", Rt, dp_w)                  # (P, 3, 6)
    du_dxi = jnp.einsum("ni,nij->nj", du, dpt)
    dv_dxi = jnp.einsum("ni,nij->nj", dv, dpt)
    J = gxs[..., None] * du_dxi[:, None, :] + gys[..., None] * dv_dxi[:, None, :]

    ok = (
        ok_h
        & front_t
        & cam_ops.is_in_image(cam_l, uv_t, boundary=2.0)
        & (p_t[..., 2] > 0.1)
    )
    return r, J, ok


@partial(jax.jit, static_argnames=("n_iters", "level", "tdist_dof",
                                   "step_tol", "sample_precision",
                                   "pair_radius"))
def refine(
    pyramids: tuple,           # tuple over levels of (K, H, W)
    points: jax.Array,         # (K, P, 3)
    point_mask: jax.Array,     # (K, P)
    poses: se3.Pose,           # (K,) world poses
    cam,
    *,
    n_iters: int = 5,
    level: int = 1,
    tdist_dof: float = 5.0,
    step_tol: float = 1e-5,
    sample_precision=jax.lax.Precision.HIGH,
    pair_radius: int = 0,
) -> se3.Pose:
    """Jointly refine all K world poses; returns the lowest-χ² evaluated
    iterate. ``step_tol=0`` restores the fixed ``n_iters`` schedule.

    ``sample_precision`` drives the one-hot MXU patch sampler: HIGH
    (bf16x3) reproduces f32 sampling; DEFAULT is single-pass bf16 — the
    (pairs, P·4, C·H) sampling contraction is the BA's dominant device op
    (measured 31% of the whole direct chunk at level 0, ≈95% of v5e bf16
    MXU peak at the HIGH pass count), so DEFAULT cuts it 3× (bench
    corridor: 67→75 fps for +4 mm ATE — the A/B table in BASELINE.md
    round-5 roofline section)."""
    K = points.shape[0]
    imgs = pyramids[level]
    cam_l = _level_cam(cam, level)

    # static pair list: all ordered pairs (WindowOptimizer.cpp:496-520), or
    # only |h−t| ≤ pair_radius when pair_radius > 0 — distant keyframe
    # pairs have the least co-visible overlap, and every per-iteration
    # tensor (samples, residuals, Jacobians) scales with the pair count
    sel = ~np.eye(K, dtype=bool)
    if pair_radius > 0:
        ij = np.abs(np.arange(K)[:, None] - np.arange(K)[None, :])
        sel &= ij <= pair_radius
    hs_np, ts_np = np.nonzero(sel)
    hs, ts = jnp.asarray(hs_np, jnp.int32), jnp.asarray(ts_np, jnp.int32)

    # pose-independent hoists: target-image gradients (K images, not
    # K·(K−1) pairs × iterations) and host-side samples (once, not per
    # GN iteration)
    grads = image.gradients(imgs)
    # NOTE the reference samples take the SAME precision as the iterate
    # samples on purpose: sampling i_ref at HIGH while i_cur is bf16 leaves
    # a precision-mismatch floor in r at convergence and measured WORSE
    # (0.0482 m) than all-bf16 (0.0433) — identical rounding on both sides
    # cancels in the difference.
    i_ref_p, ok_h_p = jax.vmap(
        lambda h: _pair_ref_samples(imgs, points, point_mask, h, cam_l,
                                    precision=sample_precision)
    )(hs)                                                      # (Pairs, P, 4)

    def system(poses):
        r, J, ok = jax.vmap(
            lambda h, t, i_ref, ok_h: _pair_residuals(
                imgs, grads, i_ref, ok_h, points, poses, h, t, cam_l,
                precision=sample_precision,
            )
        )(hs, ts, i_ref_p, ok_h_p)                             # (Pairs, P, 4[,6])
        w_ok = ok[..., None].astype(r.dtype)
        # global MAD-normalized t-dist weights (WindowOptimizer.cpp:522-560).
        # The 163k-element sort under nanmedian costs ~0.2 ms — a bisection
        # median was MEASURED 5× slower (while-loop step overhead), keep it.
        absr = jnp.abs(jnp.where(ok[..., None], r, jnp.nan))
        sigma = jnp.maximum(1.4826 * jnp.nanmedian(absr), 1e-4)
        w = gn.tdist_weight(r, sigma, tdist_dof) * w_ok

        A = jnp.einsum(
            "pnd,pndi,pndj->pij", w, J, J,
            precision=jax.lax.Precision.HIGHEST,
        )                                                      # (Pairs, 6, 6)
        v = jnp.einsum(
            "pnd,pndi,pnd->pi", w, J, r,
            precision=jax.lax.Precision.HIGHEST,
        )
        # block pattern [[A, −A], [−A, A]] at (h, t)
        H = jnp.zeros((K, K, 6, 6), A.dtype)
        H = H.at[hs, hs].add(A).at[ts, ts].add(A)
        H = H.at[hs, ts].add(-A).at[ts, hs].add(-A)
        g = jnp.zeros((K, 6), v.dtype)
        g = g.at[hs].add(v).at[ts].add(-v)
        chi2 = jnp.sum(w * r * r)
        return H, g, chi2

    # Early-exit refine loop: stop when the max-norm of the step drops below
    # ``step_tol`` — the reference solver's own convergence test
    # (``LSQNonlinear.hpp:56-60`` ``norm_max(x_) < eps_``; its refine loop
    # ``WindowOptimizer.cpp:68-148`` evaluates χ² each round and reverts on
    # increase, so returning the lowest-χ² EVALUATED iterate is faithful).
    # Warm direct-VO windows (BA runs every frame) converge in 1-2 rounds;
    # the fixed 4-round scan plus a trailing χ² evaluation paid the full
    # 20-pair sampling cost 5× per frame.
    def cond(carry):
        _, _, _, dmax, i = carry
        return (i < n_iters) & (dmax >= step_tol)

    def step(carry):
        poses, best_poses, best_chi2, _, i = carry
        H, g, chi2 = system(poses)

        better = chi2 < best_chi2
        best_poses = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), poses, best_poses
        )
        best_chi2 = jnp.minimum(chi2, best_chi2)

        Hf = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        gf = g.reshape(6 * K)
        # gauge prior on pose 0 (solve, WindowOptimizer.cpp:180-181)
        gauge = jnp.zeros((6 * K,)).at[:6].set(GAUGE_PRIOR)
        Hf = Hf + jnp.diag(gauge)
        delta = gn.solve_damped(Hf, gf, lm_lambda=1e-4).reshape(K, 6)

        new_poses = se3.Pose(
            se3.quat_normalize(
                se3.quat_mul(se3.so3_exp(delta[:, 3:]), poses.q)
            ),
            poses.t + delta[:, :3],
        )
        return (new_poses, best_poses, best_chi2, jnp.max(jnp.abs(delta)),
                i + 1)

    init = (poses, poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
            jnp.int32(0))
    _, best_poses, _, _, _ = jax.lax.while_loop(cond, step, init)
    return best_poses
