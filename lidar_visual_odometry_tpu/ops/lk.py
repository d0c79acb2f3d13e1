"""Pyramidal Lucas-Kanade optical flow, vmapped over features.

Replaces ``cv::calcOpticalFlowPyrLK`` (``featureTracking.cpp:203-211``:
25×25 window, 4 levels) with a batched inverse-compositional KLT: each
feature's window solve is a tiny 2×2 GN vmapped across all features — the
per-feature "small GN" → vmap reformulation SURVEY.md §7 calls for. The
forward/backward consistency gate (``:214-237``: re-track reversed, accept
if the round trip lands within 1 px) is ``track_pyramid_reverse_checked``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .image import bilinear, gradients


_AFF_DAMP = 0.03


def _window_offsets(win: int, dtype=jnp.float32):
    r = (win - 1) / 2.0
    xs = jnp.linspace(-r, r, win, dtype=dtype)
    ox, oy = jnp.meshgrid(xs, xs)
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (win², 2)


def _track_level(img0, img1, gx, gy, uv0, guess, *, win: int, iters: int,
                 affine: bool = False, fixed_affine=None,
                 return_affine: bool = False):
    """One pyramid level of inverse-compositional KLT for all features.

    uv0 (N, 2): feature coords in img0 at this level; guess (N, 2): current
    displacement estimate. Returns refined displacement (N, 2).

    affine=True runs the 6-DOF deformation-compensated solve: the patch is
    still SAMPLED translation-only (gather pattern unchanged — critical for
    the TPU kernel), but four affine nuisance columns (∇T·x basis) join the
    regression and the fitted deformation feeds back into the residual to
    first order (``e += (A·x)·∇T``). Under forward motion the patch zooms
    ~t_z/z per frame (±0.7 px across a 13-px window at 10 m) — a
    translation-only model absorbs that deformation into ``d`` as a bias
    that is CORRELATED across features whenever scene texture is spatially
    coherent, which is exactly the drift mode of the feature-VO corridor
    bench (measured: median flow error 0.42→0.18 px, mean bias
    0.5→0.02 px; BASELINE.md ablation table). cv::calcOpticalFlowPyrLK
    (featureTracking.cpp:203-211) is translation-only and carries this
    bias; the 6-DOF solve removes it at unchanged sampling cost.
    """
    offs = _window_offsets(win, img0.dtype)                 # (W2, 2)
    if fixed_affine is None:
        fixed_affine = jnp.zeros((uv0.shape[0], 4), img0.dtype)

    def per_feature(uv, d, fa):
        pts0 = uv[None, :] + offs                            # (W2, 2)
        t = bilinear(img0, pts0)                             # template
        jx = bilinear(gx, pts0)
        jy = bilinear(gy, pts0)
        # 2x2 normal matrix of the template gradient (inverse compositional)
        a11 = jnp.sum(jx * jx)
        a12 = jnp.sum(jx * jy)
        a22 = jnp.sum(jy * jy)
        det = a11 * a22 - a12 * a12
        ok = det > 1e-9

        if not affine:
            inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)
            ox, oy = offs[:, 0], offs[:, 1]
            # constant deformation feedback (the reverse-gate mode: the
            # forward solve's fitted params, negated); exact no-op at 0
            corr = (fa[0] * ox + fa[1] * oy) * jx \
                + (fa[2] * ox + fa[3] * oy) * jy

            def body(i, d):
                cur = bilinear(img1, pts0 + d[None, :])
                e = cur - t + corr
                b1 = jnp.sum(e * jx)
                b2 = jnp.sum(e * jy)
                dd = inv_det * jnp.stack(
                    [a22 * b1 - a12 * b2, a11 * b2 - a12 * b1]
                )
                return d - dd

            d = jax.lax.fori_loop(0, iters, body, d)
            return d, ok, jnp.zeros(4, img0.dtype)

        ox, oy = offs[:, 0], offs[:, 1]
        J = jnp.stack([jx, jy, jx * ox, jx * oy, jy * ox, jy * oy], -1)
        H = J.T @ J
        # relative Tikhonov damping on the affine block only: weakly
        # textured patches must not let the deformation DOFs wander (they
        # would drag the translation with them). Swept on the 48-frame
        # corridor: λ=0 → ATE 0.093, λ=0.1 → 0.147 (over-shrunk); a small
        # λ keeps the stabilizer without biasing the deformation fit.
        damp = jnp.concatenate(
            [jnp.zeros(2, J.dtype), _AFF_DAMP * jnp.diagonal(H)[2:]]
        )
        H = H + jnp.diag(damp) + 1e-6 * jnp.eye(6, dtype=J.dtype)
        Hinv = jnp.where(ok, 1.0, 0.0) * jnp.linalg.inv(H)

        def body(i, carry):
            d, A = carry
            cur = bilinear(img1, pts0 + d[None, :])
            # synthesized affine warp: first-order in A, no affine gather
            e = (
                cur - t
                + (A[0] * ox + A[1] * oy) * jx
                + (A[2] * ox + A[3] * oy) * jy
            )
            dp = Hinv @ (J.T @ e)
            return d - dp[:2], A - dp[2:]

        d, A = jax.lax.fori_loop(
            0, iters, body, (d, jnp.zeros(4, img0.dtype))
        )
        return d, ok, jnp.where(ok, A, 0.0)

    d, ok, A = jax.vmap(per_feature)(uv0, guess, fixed_affine)
    if return_affine:
        return d, ok, A
    return d, ok


@partial(jax.jit, static_argnames=("win", "iters", "levels", "iters_coarse",
                                   "eps", "affine", "return_affine"))
def track_pyramid(
    pyr0: tuple, pyr1: tuple, uv0: jax.Array,
    init_d: jax.Array | None = None,
    active: jax.Array | None = None,
    fixed_affine: jax.Array | None = None,
    *, win: int = 25, iters: int = 10, levels: int = 4,
    iters_coarse: int | None = None,
    eps: float = 0.0,
    affine: bool = False,
    return_affine: bool = False,
):
    """Track features uv0 (N, 2, level-0 pixels) from pyr0 to pyr1.

    Coarse-to-fine over ``levels``; returns (uv1 (N, 2), ok (N,)).
    init_d: optional (N, 2) displacement warm start in level-0 pixels
    (e.g. the negated forward flow for a shallow reverse check).
    active: optional (N,) mask — False rows skip the per-level solves on the
    TPU kernel path (the fixed-capacity feature table is never full).
    iters_coarse: GN iterations for levels > 0 (None = ``iters``). Coarse
    levels only need to land the estimate inside the next level's basin
    (< win/2 px), which a warm-started solve reaches in a few iterations;
    the finest level keeps the full count for sub-pixel accuracy.
    eps: per-feature step termination in px — the reference's
    cv::TermCriteria(COUNT+EPS, 30, 0.01) (featureTracking.cpp:211); 0
    runs the fixed count. Kernel path only (the XLA path is SIMD across
    features, so per-feature exit saves nothing there).
    affine: run the 6-DOF deformation-compensated solve at the FINEST level
    (coarse levels only need the basin; the bias it removes is sub-pixel).
    See ``_track_level``.
    fixed_affine: (N, 4) CONSTANT per-feature deformation correction
    applied at the finest level (non-affine solve) — the cheap reverse-gate
    mode fed by the forward pass's fitted params (negated).
    return_affine: additionally return the finest level's fitted affine
    params (N, 4) (requires ``affine``; zeros for not-ok rows).
    """
    scale_top = 2.0 ** (levels - 1)
    if init_d is None:
        d = jnp.zeros_like(uv0)
    else:
        d = init_d / scale_top
    ok_all = jnp.ones(uv0.shape[0], bool)
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas kernel pads rows/lanes to strip alignment internally; a
    # level still needs room for the (win+3)-wide sample corner clamps —
    # gate levels smaller than the window onto the XLA path
    from . import pallas_lk

    A_out = jnp.zeros((uv0.shape[0], 4), uv0.dtype)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        it = iters if (lvl == 0 or iters_coarse is None) else iters_coarse
        img0 = pyr0[lvl]
        img1 = pyr1[lvl]
        fits = (
            img0.shape[0] - win - 4 >= 0
            and img0.shape[1] - win - 4 >= 0
        )
        aff = affine and lvl == 0
        fixa = fixed_affine if lvl == 0 else None
        ret_a = return_affine and aff
        if on_tpu and uv0.shape[0] % 8 == 0 and fits:
            # gather-free Pallas kernel: pyramid level resident in VMEM,
            # patches via aligned slices + rolls; template gradients are
            # derived in-kernel, so no gradient images are computed here
            # batch8: one shared while_loop iterating 8 features as
            # independent straight-line chains — 1.8× on the non-affine
            # levels (per-feature while_loops are scheduling barriers;
            # hardware A/B + bit-exact parity in scripts/exp_lk_batch.py)
            res = pallas_lk.lk_level(
                img0, img1, uv0 / s, d, active, fixa, win=win, iters=it,
                eps=eps, affine=aff, batch8=True, return_affine=ret_a,
            )
        else:
            gx, gy = gradients(img0)
            res = _track_level(
                img0, img1, gx, gy, uv0 / s, d, win=win, iters=it,
                affine=aff, fixed_affine=fixa, return_affine=ret_a,
            )
        if ret_a:
            d, ok, A_out = res
        else:
            d, ok = res
        ok_all = ok_all & ok
        if lvl > 0:
            d = d * 2.0
    uv1 = uv0 + d
    H, W = pyr1[0].shape
    inb = (
        (uv1[:, 0] >= 1) & (uv1[:, 0] < W - 1)
        & (uv1[:, 1] >= 1) & (uv1[:, 1] < H - 1)
    )
    if return_affine:
        return uv1, ok_all & inb, A_out
    return uv1, ok_all & inb


@partial(jax.jit, static_argnames=("win", "iters", "levels",
                                   "reverse_levels", "iters_coarse", "eps",
                                   "affine", "reverse_affine"))
def track_pyramid_reverse_checked(
    pyr0: tuple, pyr1: tuple, uv0: jax.Array,
    active: jax.Array | None = None,
    init_d: jax.Array | None = None,
    *, win: int = 25, iters: int = 10, levels: int = 4,
    max_reverse_err: float = 1.0,
    reverse_levels: int | None = None,
    iters_coarse: int | None = None,
    eps: float = 0.0,
    affine: bool = False,
    reverse_affine: bool | str = True,
) -> tuple[jax.Array, jax.Array]:
    """Forward + reverse track with round-trip gate ≤ max_reverse_err px.

    reverse_levels < levels runs a SHALLOW reverse check: the reverse track
    is warm-started at the exact negated forward flow and refined over only
    the finest ``reverse_levels`` levels. Inliers converge back within the
    gate regardless of the coarse levels; outliers sit in the wrong level-0
    basin and still fail. Cuts the LK cost (the dominant visual-stage
    kernel) by ~(levels - reverse_levels)/(2·levels); None = full reverse
    (the reference's cv::calcOpticalFlowPyrLK round trip,
    featureTracking.cpp:214-237).

    reverse_affine ∈ {"solve" (= True), "fixed", "none" (= False)} selects
    the reverse GATE leg's deformation handling. The affine reverse call
    costs the full affine setup (the 21 column sums + Cholesky per
    feature) even when the warm-started loop exits after 1-2 iterations —
    3.62 vs 0.84 ms/call on v5e at the bench shape. "none" MEASURED WORSE
    end-to-end (scripts/exp_lk_reverse_affine.py: ate_visual 0.0821 →
    0.1532 m for +4 fps): the translation-only reverse leg re-absorbs
    patch deformation into its round-trip error, so the 1 px gate
    preferentially rejects features. "fixed" corrects the reverse residual
    with the FORWARD solve's fitted affine params, negated (the img1→img0
    deformation is the inverse ≈ negation to first order) — no
    reverse-side Gram/Cholesky setup at all. Measured (same harness):
    "fixed" lands at 0.1445 m — barely better than "none" — so the solve
    gate's value is the per-feature 6-DOF model-fit TEST itself, not
    deformation compensation; "solve" stays the default and the cheap
    modes are documented throughput-first alternatives (BASELINE.md).
    """
    mode = {True: "solve", False: "none"}.get(reverse_affine,
                                              reverse_affine)
    assert mode in ("solve", "fixed", "none"), reverse_affine
    want_A = affine and mode == "fixed"
    fwd = track_pyramid(
        pyr0, pyr1, uv0, init_d, active,
        win=win, iters=iters, levels=levels, iters_coarse=iters_coarse,
        eps=eps, affine=affine, return_affine=want_A,
    )
    if want_A:
        uv1, ok_f, A = fwd
    else:
        uv1, ok_f = fwd
    rl = levels if reverse_levels is None else min(reverse_levels, levels)
    # reverse pass: only forward survivors need the round-trip check
    act_b = ok_f if active is None else (active & ok_f)
    uv0_back, ok_b = track_pyramid(
        pyr1[:rl], pyr0[:rl], uv1, uv0 - uv1, act_b,
        -A if want_A else None,
        win=win, iters=iters, levels=rl, iters_coarse=iters_coarse,
        eps=eps, affine=affine and mode == "solve",
    )
    err = jnp.linalg.norm(uv0_back - uv0, axis=-1)
    return uv1, ok_f & ok_b & (err <= max_reverse_err)
