"""Pallas TPU kernel: pyramidal inverse-compositional KLT, one level per launch.

The vmapped-XLA formulation (ops/lk.py) gathers every bilinear sample through
an arbitrary-index gather — TPUs serialize those (~2.7 s/frame for 1024
features × 4 levels × 10 iterations, ``featureTracking.cpp:203-211``
semantics). Here the whole pyramid level lives in VMEM and a patch sample is:

  1. one 8-aligned dynamic sublane slice + one 128-aligned dynamic lane slice
     (``pl.multiple_of`` alignment hints) → a (rows, 256) strip,
  2. two dynamic ``pltpu.roll``s to put the window's integer corner at (0, 0),
  3. static slices + fractional mixes for bilinear interpolation.

No gathers anywhere. Each grid step tracks a block of FB features with a
``fori_loop``; the template and BOTH its gradients come from ONE padded
(win+2)² sample: bilinear interpolation is linear and the ±1 central
difference (``image.gradients``, Tracker2.cpp:151-160) is a shift stencil, so
central-differencing the sampled patch equals sampling the gradient images —
exactly, in the interior. That removes two of the three setup samples per
feature AND the two (H, W) gradient-image inputs (VMEM + an XLA pass per
level per call): measured ~30% off the kernel, which dominates the visual
chunk's device time. The 2×2 inverse-compositional normal matrix is built
in-kernel from those patch gradients.

Border behavior differs from ops/lk.py by design: the window *origin* clamps
into the image (the XLA path clamps each sample), so features closer than
win/2+2 px to a border may track differently — both paths gate them out via
the in-bounds + reverse checks.

``mxu=True`` swaps the roll+mix sampling engine for two two-tap one-hot MXU
contractions per sample (rowsel/colsel fold the rolls AND the bilinear
mixes). Measured on v5e (scripts/exp_lk_mxu.py, 768 features, win 13,
level-0 640×192): SAME speed (3.43 vs 3.33 ms/call; parity ≤0.03 px) —
i.e. the kernel is bound by the per-feature SERIAL dependency chain
(corner math → load → sample → solve per iteration, one feature at a
time on one core), not by the sampling engine's shuffle or matmul
throughput. The remaining levers are feature count and iteration count
(both already adaptive); see BASELINE.md "Kernel roofline" for the
speed-of-light accounting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .lk import _AFF_DAMP


def _strip_rows(win: int) -> int:
    # win+2 template patch + 1 bilinear tap + ≤7 sublane alignment, rounded
    # up to a MULTIPLE OF 32 sublanes: measured on hardware (v5e), a
    # dynamic pltpu.roll along the sublane axis of a (rows, 256) f32 array
    # silently corrupts rows when ``rows`` is 24 or 40, and is exact at 32
    # (win 9/11/13 and 25 tracked 10-50 px off true shift while 15-21,
    # whose strips were 32 rows, were exact; interpret mode hides it).
    need = win + 11
    return -(-need // 32) * 32


def _chol6(Hm):
    """Unrolled 6×6 Cholesky on scalar entries (list-of-lists); all ops are
    traced scalars — fine inside a Pallas kernel body."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = Hm[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    return L


def _solve6(L, b):
    """x = (L Lᵀ)⁻¹ b, unrolled forward/back substitution on scalars."""
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _make_samplers(win, H, Hpad, W, Wpad):
    """strip/mix/corner sampling helpers shared by the per-feature and the
    batch8 kernel bodies (closure over the level geometry)."""
    rows = _strip_rows(win)

    def corner(xf, yf, w):
        """Clamped integer corner + fractions + aligned strip base."""
        xi = jnp.floor(xf).astype(jnp.int32)
        yi = jnp.floor(yf).astype(jnp.int32)
        fx = xf - xi.astype(jnp.float32)
        fy = yf - yi.astype(jnp.float32)
        xi = jnp.clip(xi, 0, W - w - 1)
        yi = jnp.clip(yi, 0, H - w - 1)
        # keep the strip inside the (Hpad, Wpad) block. Hpad is a multiple
        # of 8 with Hpad >= rows, so the clamp value Hpad - rows is itself
        # 8-aligned, and the roll below never wraps patch rows:
        # yi <= H - w - 1 <= Hpad - w - 1  =>  yi - ya + w + 1 <= rows
        # in the clamped branch, and yi - ya <= 7 < rows - (w + 1) in the
        # aligned branch (rows >= win + 11 by _strip_rows).
        ya = pl.multiple_of(
            jnp.minimum((yi // 8) * 8, Hpad - rows), 8
        )
        xa = pl.multiple_of(
            jnp.minimum((xi // 128) * 128, Wpad - 256), 128
        )
        return xi, yi, fx, fy, xa, ya

    def strip(ref, xf, yf, w):
        """(rows, 256) strip whose (0, 0) is the integer corner of a float
        (xf, yf) top-left, plus the fractional offsets — w is the patch
        width the corner clamp must accommodate."""
        xi, yi, fx, fy, xa, ya = corner(xf, yf, w)
        s = ref[pl.ds(ya, rows), pl.ds(xa, 256)]
        s = pltpu.roll(s, ya - yi, 0)
        s = pltpu.roll(s, xa - xi, 1)
        return s, fx, fy

    def mix(s, fx, fy, w):
        """Bilinear (w, w) patch from a corner-aligned strip."""
        v = s[: w + 1, :]
        v = v[:w, :] * (1.0 - fy) + v[1: w + 1, :] * fy
        return v[:, :w] * (1.0 - fx) + v[:, 1: w + 1] * fx

    return corner, strip, mix


def _lk_level_kernel(win, iters, eps, affine, mxu, unroll, H, Hpad, W,
                     fb, q_ref, i0_ref, i1_ref, out_ref):
    Wpad = i0_ref.shape[1]
    rows = _strip_rows(win)
    r = (win - 1) / 2.0
    corner, strip, mix = _make_samplers(win, H, Hpad, W, Wpad)

    def sample_mxu(ref, xf, yf, w, margin):
        """Bilinear (w, w) patch as TWO two-tap one-hot MXU contractions:
        rowsel (w, rows) folds the sublane roll + y-mix, colsel (256, w)
        folds the 256-lane roll + x-mix. The roll+mix path issues ~10 VPU
        ops over (rows, 256) vregs per sample (the dynamic lane roll alone
        is a multi-stage shuffle); here each sample is two small matmuls the
        MXU pipelines. Clamp semantics identical to strip() (margin = the
        corner clamp's patch width)."""
        xi, yi, fx, fy, xa, ya = corner(xf, yf, margin)
        s = ref[pl.ds(ya, rows), pl.ds(xa, 256)]
        dy = yi - ya
        dx = xi - xa
        ri = jax.lax.broadcasted_iota(jnp.int32, (w, rows), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (w, rows), 0) + dy
        rowsel = (
            (ri == rr).astype(jnp.float32) * (1.0 - fy)
            + (ri == rr + 1).astype(jnp.float32) * fy
        )
        ci = jax.lax.broadcasted_iota(jnp.int32, (256, w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (256, w), 1) + dx
        colsel = (
            (ci == cc).astype(jnp.float32) * (1.0 - fx)
            + (ci == cc + 1).astype(jnp.float32) * fx
        )
        t = jnp.dot(rowsel, s, preferred_element_type=jnp.float32)
        return jnp.dot(t, colsel, preferred_element_type=jnp.float32)

    if mxu:
        def sample(ref, xf, yf):
            return sample_mxu(ref, xf, yf, win, win + 1)
    else:
        def sample(ref, xf, yf):
            s, fx, fy = strip(ref, xf, yf, win + 1)
            return mix(s, fx, fy, win)

    def per_feature(f, _):
        x = q_ref[f, 0]
        y = q_ref[f, 1]
        dx0 = q_ref[f, 2]
        dy0 = q_ref[f, 3]

        # inactive feature slots (padding of the fixed-capacity table, or
        # rows already killed by earlier gates) skip the whole solve — the
        # table is 1024 slots but ≤ grid_rows·grid_cols·per_cell are ever
        # live, so this saves ≥18% of kernel time for free
        @pl.when(q_ref[f, 4] > 0.0)
        def _track():
            tx = x - r
            ty = y - r
            # ONE (win+2)² template sample; gradients by central difference
            # of the padded patch ≡ bilinear samples of image.gradients in
            # the interior (linearity of bilinear interpolation)
            if mxu:
                p = sample_mxu(i0_ref, tx - 1.0, ty - 1.0, win + 2, win + 3)
            else:
                s, fx, fy = strip(i0_ref, tx - 1.0, ty - 1.0, win + 3)
                p = mix(s, fx, fy, win + 2)           # (win+2, win+2)
            t = p[1: win + 1, 1: win + 1]
            jx = 0.5 * (p[1: win + 1, 2: win + 2] - p[1: win + 1, 0:win])
            jy = 0.5 * (p[2: win + 2, 1: win + 1] - p[0:win, 1: win + 1])
            a11 = jnp.sum(jx * jx)
            a12 = jnp.sum(jx * jy)
            a22 = jnp.sum(jy * jy)
            det = a11 * a22 - a12 * a12
            ok = det > 1e-9

            if not affine:
                inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)

                # GN iterations with the reference's EPS termination
                # (cv::TermCriteria(COUNT+EPS, 30, 0.01),
                # featureTracking.cpp:211): stop once the step shrinks below
                # ``eps`` px. Warm coarse-to-fine features converge in 2-4
                # iterations — the fixed count paid the full sample cost per
                # feature per level. eps=0 reproduces the fixed schedule.
                def cond(c):
                    i, _, _, dd2 = c
                    return (i < iters) & (dd2 >= eps * eps)

                def body(c):
                    i, dx, dy, _ = c
                    cur = sample(i1_ref, tx + dx, ty + dy)
                    e = cur - t
                    b1 = jnp.sum(e * jx)
                    b2 = jnp.sum(e * jy)
                    ddx = inv_det * (a22 * b1 - a12 * b2)
                    ddy = inv_det * (a11 * b2 - a12 * b1)
                    return (i + 1, dx - ddx, dy - ddy, ddx * ddx + ddy * ddy)

                _, dx, dy, _ = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), dx0, dy0, jnp.float32(jnp.inf))
                )
            else:
                # 6-DOF deformation-compensated solve (ops/lk._track_level
                # affine mode): SAMPLING stays translation-only — the same
                # strip+roll pattern — while four affine nuisance columns
                # absorb the forward-motion patch deformation that would
                # otherwise bias ``d`` (the feature-VO drift mode; see
                # BASELINE.md ablation). Template-side work: 21 column
                # sums + one unrolled 6×6 Cholesky per feature; per
                # iteration: 6 sums + two triangular solves, all scalars.
                rr = jnp.float32(r)
                # Mosaic's tpu.iota is integer-only — build int32 and cast
                # (f32 iota verifies in interpret mode but fails on TPU)
                oxg = jax.lax.broadcasted_iota(
                    jnp.int32, (win, win), 1
                ).astype(jnp.float32) - rr
                oyg = jax.lax.broadcasted_iota(
                    jnp.int32, (win, win), 0
                ).astype(jnp.float32) - rr
                cols = (jx, jy, jx * oxg, jx * oyg, jy * oxg, jy * oyg)
                Hm = [[None] * 6 for _ in range(6)]
                for ii in range(6):
                    for jj in range(ii + 1):
                        v = jnp.sum(cols[ii] * cols[jj])
                        if ii == jj:
                            # relative damping on the affine block, value
                            # shared via _AFF_DAMP (= lk._AFF_DAMP = 0.03;
                            # lambda sweep in BASELINE.md — keep the two
                            # paths numerically aligned)
                            if ii >= 2:
                                v = v * (1.0 + _AFF_DAMP)
                            v = v + 1e-6
                        Hm[ii][jj] = v
                        Hm[jj][ii] = v
                L = _chol6(Hm)

                def cond(c):
                    i = c[0]
                    dd2 = c[7]
                    return (i < iters) & (dd2 >= eps * eps)

                def body(c):
                    i, dx, dy, a0, a1, a2, a3, _ = c
                    cur = sample(i1_ref, tx + dx, ty + dy)
                    e = (
                        cur - t
                        + (a0 * oxg + a1 * oyg) * jx
                        + (a2 * oxg + a3 * oyg) * jy
                    )
                    b = [jnp.sum(e * cols[ii]) for ii in range(6)]
                    dp = _solve6(L, b)
                    return (
                        i + 1, dx - dp[0], dy - dp[1],
                        a0 - dp[2], a1 - dp[3], a2 - dp[4], a3 - dp[5],
                        dp[0] * dp[0] + dp[1] * dp[1],
                    )

                z = jnp.float32(0.0)
                _, dx, dy, _, _, _, _, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), dx0, dy0, z, z, z, z,
                     jnp.float32(jnp.inf)),
                )
                # Mirror the XLA path (lk.py zeroes Hinv when not ok): a
                # degenerate template must return the untouched guess, not
                # whatever the damped Cholesky iterated to.
                dx = jnp.where(ok, dx, dx0)
                dy = jnp.where(ok, dy, dy0)
            out_ref[f, 0] = dx
            out_ref[f, 1] = dy
            out_ref[f, 2] = ok.astype(jnp.float32)
            out_ref[f, 3] = jnp.float32(0.0)

        @pl.when(q_ref[f, 4] <= 0.0)
        def _skip():
            out_ref[f, 0] = dx0
            out_ref[f, 1] = dy0
            out_ref[f, 2] = jnp.float32(0.0)
            out_ref[f, 3] = jnp.float32(0.0)

        return 0

    jax.lax.fori_loop(0, fb, per_feature, 0, unroll=unroll)


def _lk_level_kernel_b8(win, iters, eps, affine, fixed_aff, H, Hpad, W, fb,
                        q_ref, i0_ref, i1_ref, out_ref):
    """Batched-feature body: ONE shared while_loop iterates all ``fb``
    features together, with per-feature masked convergence.

    Why: the per-feature kernel is bound by each feature's serial
    sample→solve dependency chain, and separate ``while_loop``s are
    control-flow barriers Mosaic cannot interleave (measured: engine swap
    and fori unrolling both change nothing — BASELINE roofline). Here the
    loop BODY contains ``fb`` independent sample chains in one straight-line
    block, giving the scheduler real instruction-level parallelism. Cost:
    the shared loop runs to the LAST unconverged feature (each converged
    feature freezes via masks, but still samples); with coherent warm
    starts the per-feature iteration counts cluster, so the max ≈ the mean.
    Semantics match the per-feature kernel exactly (same update order, same
    eps freeze, same ok gating) — parity asserted on hardware in
    scripts/exp_lk_batch.py.

    Block size: fb=8 is the measured optimum (scripts/exp_lk_fb.py —
    8/16/32 → 1.55/2.24/2.31 ms non-affine, 3.56/3.89/4.19 affine on v5e
    at the bench shape): 8 chains already saturate the scheduler, and a
    bigger block both raises register/VMEM pressure and makes the shared
    loop wait on a larger block's slowest feature.

    ``fixed_aff``: translation-only 2×2 solve whose residual is corrected
    by a CONSTANT per-feature affine deformation read from q columns 5-8
    (the forward solve's fitted params, negated — the reverse-gate use).
    Costs the non-affine setup (3 Gram sums, no Cholesky) while keeping
    the deformation compensation that the round-trip gate needs; with
    zero params it is numerically identical to the plain non-affine body.
    ``affine`` mode additionally writes the fitted affine params to out
    columns 4-7 when the out block is 8 wide (``return_affine``)."""
    Wpad = i0_ref.shape[1]
    r = (win - 1) / 2.0
    corner, strip, mix = _make_samplers(win, H, Hpad, W, Wpad)

    def sample(ref, xf, yf):
        s, fx, fy = strip(ref, xf, yf, win + 1)
        return mix(s, fx, fy, win)

    acts = [q_ref[f, 4] > 0.0 for f in range(fb)]
    any_act = acts[0]
    for f in range(1, fb):
        any_act = any_act | acts[f]

    @pl.when(any_act)
    def _block():
        # ---- per-feature setup (template sample + normal factors) ----
        txs, tys, d0s = [], [], []
        ts, jxs, jys, oks = [], [], [], []
        setups = []
        fas = []
        if affine or fixed_aff:
            rr = jnp.float32(r)
            oxg = jax.lax.broadcasted_iota(
                jnp.int32, (win, win), 1
            ).astype(jnp.float32) - rr
            oyg = jax.lax.broadcasted_iota(
                jnp.int32, (win, win), 0
            ).astype(jnp.float32) - rr
        for f in range(fb):
            x = q_ref[f, 0]
            y = q_ref[f, 1]
            d0s.append((q_ref[f, 2], q_ref[f, 3]))
            tx = x - r
            ty = y - r
            txs.append(tx)
            tys.append(ty)
            s, fx, fy = strip(i0_ref, tx - 1.0, ty - 1.0, win + 3)
            p = mix(s, fx, fy, win + 2)
            t = p[1: win + 1, 1: win + 1]
            jx = 0.5 * (p[1: win + 1, 2: win + 2] - p[1: win + 1, 0:win])
            jy = 0.5 * (p[2: win + 2, 1: win + 1] - p[0:win, 1: win + 1])
            ts.append(t)
            jxs.append(jx)
            jys.append(jy)
            a11 = jnp.sum(jx * jx)
            a12 = jnp.sum(jx * jy)
            a22 = jnp.sum(jy * jy)
            det = a11 * a22 - a12 * a12
            ok = det > 1e-9
            oks.append(ok)
            if not affine:
                inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)
                setups.append((a11, a12, a22, inv_det))
                if fixed_aff:
                    fas.append((q_ref[f, 5], q_ref[f, 6],
                                q_ref[f, 7], q_ref[f, 8]))
            else:
                cols = (jx, jy, jx * oxg, jx * oyg, jy * oxg, jy * oyg)
                Hm = [[None] * 6 for _ in range(6)]
                for ii in range(6):
                    for jj in range(ii + 1):
                        v = jnp.sum(cols[ii] * cols[jj])
                        if ii == jj:
                            if ii >= 2:
                                v = v * (1.0 + _AFF_DAMP)
                            v = v + 1e-6
                        Hm[ii][jj] = v
                        Hm[jj][ii] = v
                setups.append((cols, _chol6(Hm)))

        npar = 2 if not affine else 6
        inf = jnp.float32(jnp.inf)
        zero = jnp.float32(0.0)
        # inactive rows start frozen (dd2 = 0 < eps²) so they never update
        # and never extend the shared loop
        dd2_init = [jnp.where(acts[f], inf, zero) for f in range(fb)]
        params0 = []
        for f in range(fb):
            d = [d0s[f][0], d0s[f][1]] + [zero] * (npar - 2)
            params0.extend(d)

        def cond(c):
            i = c[0]
            dd2s = c[1: 1 + fb]
            m = dd2s[0]
            for f in range(1, fb):
                m = jnp.maximum(m, dd2s[f])
            return (i < iters) & (m >= eps * eps)

        def body(c):
            i = c[0]
            dd2s = list(c[1: 1 + fb])
            ps = list(c[1 + fb:])
            # fb INDEPENDENT sample chains in one straight-line block
            curs = [
                sample(i1_ref, txs[f] + ps[f * npar],
                       tys[f] + ps[f * npar + 1])
                for f in range(fb)
            ]
            new_dd2, new_ps = [], []
            for f in range(fb):
                pf = ps[f * npar: (f + 1) * npar]
                live = dd2s[f] >= eps * eps
                if not affine:
                    a11, a12, a22, inv_det = setups[f]
                    e = curs[f] - ts[f]
                    if fixed_aff:
                        # constant deformation feedback (forward-fitted
                        # params, supplied via q cols 5-8) — exact no-op
                        # when the params are zero
                        fa = fas[f]
                        e = (
                            e
                            + (fa[0] * oxg + fa[1] * oyg) * jxs[f]
                            + (fa[2] * oxg + fa[3] * oyg) * jys[f]
                        )
                    b1 = jnp.sum(e * jxs[f])
                    b2 = jnp.sum(e * jys[f])
                    dp = [inv_det * (a22 * b1 - a12 * b2),
                          inv_det * (a11 * b2 - a12 * b1)]
                else:
                    cols, L = setups[f]
                    e = (
                        curs[f] - ts[f]
                        + (pf[2] * oxg + pf[3] * oyg) * jxs[f]
                        + (pf[4] * oxg + pf[5] * oyg) * jys[f]
                    )
                    # (A separable-sum restructure of these six reductions
                    # — factoring the ox/oy ramps through row/column partial
                    # sums — verified in interpret mode but produced 4-px
                    # outliers vs the per-feature kernel ON HARDWARE; the
                    # direct 2-D sums are kept. Same lesson as the
                    # strip-rows corruption: validate every Mosaic
                    # reduction-shape change on the chip.)
                    b = [jnp.sum(e * cols[ii]) for ii in range(6)]
                    dp = _solve6(L, b)
                step2 = dp[0] * dp[0] + dp[1] * dp[1]
                new_ps.extend(
                    jnp.where(live, pf[k] - dp[k], pf[k])
                    for k in range(npar)
                )
                new_dd2.append(jnp.where(live, step2, dd2s[f]))
            return tuple([i + 1] + new_dd2 + new_ps)

        out = jax.lax.while_loop(
            cond, body, tuple([jnp.int32(0)] + dd2_init + params0)
        )
        ps = out[1 + fb:]
        for f in range(fb):
            dx = ps[f * npar]
            dy = ps[f * npar + 1]
            if affine:
                # degenerate templates return the untouched guess (mirrors
                # the per-feature kernel / XLA path)
                dx = jnp.where(oks[f], dx, d0s[f][0])
                dy = jnp.where(oks[f], dy, d0s[f][1])
            out_ref[f, 0] = jnp.where(acts[f], dx, d0s[f][0])
            out_ref[f, 1] = jnp.where(acts[f], dy, d0s[f][1])
            out_ref[f, 2] = (oks[f] & acts[f]).astype(jnp.float32)
            out_ref[f, 3] = jnp.float32(0.0)
            if out_ref.shape[-1] == 8:
                # return_affine: fitted deformation params (0 for rows the
                # solve never touched)
                gate = oks[f] & acts[f]
                for k in range(4):
                    out_ref[f, 4 + k] = jnp.where(
                        gate, ps[f * npar + 2 + k], jnp.float32(0.0)
                    )

    @pl.when(~any_act)
    def _skip_block():
        for f in range(fb):
            out_ref[f, 0] = q_ref[f, 2]
            out_ref[f, 1] = q_ref[f, 3]
            out_ref[f, 2] = jnp.float32(0.0)
            out_ref[f, 3] = jnp.float32(0.0)
            if out_ref.shape[-1] == 8:
                for k in range(4):
                    out_ref[f, 4 + k] = jnp.float32(0.0)


@partial(jax.jit, static_argnames=("win", "iters", "eps", "fb", "affine",
                                   "mxu", "unroll", "batch8", "interpret",
                                   "return_affine"))
def lk_level(
    img0: jax.Array,    # (H, W) float32
    img1: jax.Array,
    uv0: jax.Array,     # (N, 2) feature centers in this level's pixels
    guess: jax.Array,   # (N, 2) initial displacement
    active: jax.Array | None = None,  # (N,) bool; False rows skip the solve
    fixed_affine: jax.Array | None = None,  # (N, 4) constant deformation
    *,
    win: int = 25,
    iters: int = 10,
    eps: float = 0.0,
    fb: int = 8,
    affine: bool = False,
    mxu: bool = False,
    unroll: int = 1,
    batch8: bool = False,
    interpret: bool = False,
    return_affine: bool = False,
):
    """Refined displacement + Hessian-ok flag for one pyramid level.

    Returns (d (N, 2), ok (N,)) — plus the fitted affine params (N, 4)
    when ``return_affine`` (affine + batch8 only). N must be a multiple of
    fb; images are lane-padded internally. Inactive rows return
    (guess, ok=False) without touching the images. Template gradients are
    derived in-kernel (see module docstring) — no gradient images are
    taken or computed. ``fixed_affine`` (batch8, non-affine only) applies
    a CONSTANT per-feature deformation correction to the residual — the
    translation-only solve with the forward pass's fitted params (negated)
    is the cheap reverse-gate mode.
    """
    H, W = img0.shape
    N = uv0.shape[0]
    assert N % fb == 0, (N, fb)
    fixed_aff = fixed_affine is not None
    if fixed_aff:
        assert batch8 and not affine, "fixed_affine: batch8 non-affine only"
    if return_affine:
        assert batch8 and affine, "return_affine: batch8 affine only"
    Wpad = max(-(-W // 128) * 128, 256)
    rows = _strip_rows(win)
    # rows are padded to 8-alignment (and at least one full strip) exactly
    # like lanes are padded to 128 — non-8-multiple heights (e.g. KITTI
    # pyramid levels 188/94/47) would otherwise force the strip base clamp
    # to wrap patch rows circularly through pltpu.roll
    Hpad = max(-(-H // 8) * 8, rows)
    pad = Wpad - W
    padh = Hpad - H

    def padw(a):
        if pad or padh:
            return jnp.pad(a, ((0, padh), (0, pad)))
        return a

    act = (
        jnp.ones((N, 1), jnp.float32) if active is None
        else active.astype(jnp.float32)[:, None]
    )
    qcols = [uv0.astype(jnp.float32), guess.astype(jnp.float32), act]
    if fixed_aff:
        qcols.append(fixed_affine.astype(jnp.float32))
    q = jnp.concatenate(qcols, axis=-1)  # (N, 5) or (N, 9)
    qw = q.shape[1]
    ow = 8 if return_affine else 4
    kern = (
        partial(_lk_level_kernel_b8, win, iters, eps, affine, fixed_aff,
                H, Hpad, W, fb)
        if batch8 else
        partial(_lk_level_kernel, win, iters, eps, affine, mxu, unroll,
                H, Hpad, W, fb)
    )
    out = pl.pallas_call(
        kern,
        grid=(N // fb,),
        in_specs=[
            pl.BlockSpec((fb, qw), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Hpad, Wpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hpad, Wpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fb, ow), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((N, ow), jnp.float32),
        interpret=interpret,
    )(q, padw(img0), padw(img1))
    if return_affine:
        return out[:, :2], out[:, 2] > 0.5, out[:, 4:8]
    return out[:, :2], out[:, 2] > 0.5
