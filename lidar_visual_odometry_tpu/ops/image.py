"""Image ops: pyramids, gradients, bilinear sampling, corner scores.

TPU-native replacements for the OpenCV calls in the visual frontend:

* ``pyr_down`` ≡ the reference's custom 2×2-mean ``pyrDownMeanSmooth``
  (``src/vloam/Frame.cpp:407-444``),
* ``gradients`` ≡ the ±1 central differences used by the photometric tracker
  (``Tracker2.cpp:151-160``),
* ``bilinear`` ≡ per-patch interpolation (``Tracker2.cpp:124-150``) as a
  batched gather — the core primitive for LK and direct tracking,
* ``shi_tomasi_score`` ≡ the Harris/FAST detection stack of featureTracking
  (``featureTracking.cpp:101,145-160``): one dense min-eigenvalue score map
  replaces per-subregion FAST calls (a dense map + per-cell top-k is the
  batched reformulation of "detect in deficient subregions"),
* ``normalize_contrast`` stands in for CLAHE (``featureTracking.cpp:93``):
  global mean/std normalization — adequate for tracking scores; full CLAHE is
  gridded-histogram work the scores don't need.

Images are (H, W) float32 in [0, 1], y-down pixel coords, `uv = (x, y)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pyr_down(img: jax.Array) -> jax.Array:
    """2×2 mean downsample (pyrDownMeanSmooth)."""
    H, W = img.shape[-2:]
    x = img[..., : H - H % 2, : W - W % 2]
    x = x.reshape(*x.shape[:-2], H // 2, 2, W // 2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """[level0 (full res), level1 (half), ...] (Frame.cpp:252-286)."""
    out = [img]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradients (dx, dy), same shape, zero at borders."""
    gx = jnp.zeros_like(img)
    gx = gx.at[..., :, 1:-1].set(0.5 * (img[..., :, 2:] - img[..., :, :-2]))
    gy = jnp.zeros_like(img)
    gy = gy.at[..., 1:-1, :].set(0.5 * (img[..., 2:, :] - img[..., :-2, :]))
    return gx, gy


def bilinear(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample (H, W) image at float coords uv (..., 2) = (x, y).

    Out-of-bounds clamps to the border (callers gate with in-image masks).
    """
    H, W = img.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _two_tap(idx0: jax.Array, idx1: jax.Array, w: jax.Array, n: int):
    """(N, n) two-tap interpolation matrix: (1-w) at idx0, w at idx1.

    idx1 may equal idx0 at the clamped border — the taps then sum to 1,
    matching the gather-based ``bilinear`` exactly.
    """
    r = jnp.arange(n, dtype=jnp.int32)[None, :]
    return (
        (r == idx0[:, None]).astype(w.dtype) * (1.0 - w)[:, None]
        + (r == idx1[:, None]).astype(w.dtype) * w[:, None]
    )


def bilinear_mxu(
    imgs: jax.Array, uv: jax.Array,
    *, precision=jax.lax.Precision.HIGH,
) -> jax.Array:
    """``bilinear`` for a STACK of images sharing sample coords, gather-free.

    TPU gathers serialize (CLAUDE.md layout rules); this reformulates the
    4-tap sample as a separable one-hot contraction that runs on the MXU:
    ``out[c, s] = Σ_h Σ_w rowsel[s, h] · imgs[c, h, w] · colsel[s, w]``,
    i.e. one (N, H)×(C·H, W) matmul + a (N, W) two-tap row reduction. The
    hot callers (direct tracker / window BA) sample the image, its x- and
    y-gradient at the SAME coords — stacking them as C=3 shares the big
    matmul's one-hot operand. bf16x3 (``HIGH``) ≈ f32 for [0,1] intensities
    (this feeds photometric residuals, not geometry — HIGHEST per the
    geometry rule is not needed).

    imgs: (C, H, W); uv: (..., 2). Returns (C, ...).
    """
    C, H, W = imgs.shape
    shape = uv.shape[:-1]
    x = jnp.clip(uv[..., 0].reshape(-1), 0.0, W - 1.001)
    y = jnp.clip(uv[..., 1].reshape(-1), 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    rowsel = _two_tap(y0, y1, y - y0, H)            # (N, H)
    colsel = _two_tap(x0, x1, x - x0, W)            # (N, W)
    # contract the LONGER image axis in the MXU matmul so the per-sample
    # intermediate is (N, C·min(H,W)) — the follow-up two-tap reduction is
    # HBM-bound on that intermediate, and camera images are wide (W≈3H):
    # W-first cuts its traffic ~3× (measured on the direct-VO BA trace)
    if W >= H:
        t = jnp.matmul(
            colsel, imgs.transpose(2, 0, 1).reshape(W, C * H),
            precision=precision,
        ).reshape(-1, C, H)                         # (N, C, H)
        out = jnp.einsum("nch,nh->cn", t, rowsel, precision=precision)
    else:
        t = jnp.matmul(
            rowsel, imgs.transpose(1, 0, 2).reshape(H, C * W),
            precision=precision,
        ).reshape(-1, C, W)                         # (N, C, W)
        out = jnp.einsum("ncw,nw->cn", t, colsel, precision=precision)
    return out.reshape(C, *shape)


def box_sum(img: jax.Array, k: int) -> jax.Array:
    """k×k window sum with zero padding ('same') — two cumsum differences.

    Exactly ``convolve2d(img, ones((k, k)), mode='same')`` but TPU-fast:
    convolutions with 1-channel inputs lower poorly (im2col), while cumsums
    are cheap log-step reduce-windows.
    """
    r = k // 2
    p = jnp.pad(img, ((r, r), (0, 0)))
    c = jnp.cumsum(p, axis=0)
    c = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
    v = c[k:, :] - c[:-k, :]
    p = jnp.pad(v, ((0, 0), (r, r)))
    c = jnp.cumsum(p, axis=1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
    return c[:, k:] - c[:, :-k]


def shi_tomasi_score(img: jax.Array, window: int = 3) -> jax.Array:
    """Min-eigenvalue corner score map (what cv::goodFeaturesToTrack ranks;
    monotone-equivalent to FAST response for selection purposes)."""
    gx, gy = gradients(img)
    xx = gx * gx
    yy = gy * gy
    xy = gx * gy

    def box(a):
        return box_sum(a, window) / (window * window)

    sxx, syy, sxy = box(xx), box(yy), box(xy)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # λ_min


def normalize_contrast(img: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Zero-mean/unit-std luminance normalization (cheap CLAHE stand-in)."""
    mu = img.mean()
    sd = img.std()
    return (img - mu) / jnp.maximum(sd, eps)


def clahe(
    img: jax.Array,
    *,
    grid: tuple[int, int] = (8, 8),
    clip_limit: float = 3.0,
    n_bins: int = 256,
) -> jax.Array:
    """Contrast-limited adaptive histogram equalization
    (≡ ``cv::createCLAHE(3.0, (8, 8))`` at ``featureTracking.cpp:92-95``).

    Standard CLAHE: per-tile clipped histogram → equalization LUT, pixels
    remapped by bilinear interpolation between the 4 surrounding tile LUTs.
    Clipped excess is redistributed uniformly in one pass (OpenCV adds a
    residual-redistribution loop whose effect is < 1 gray level).

    Input (H, W) float in [0, 1]; output same. The histogram is one
    scatter-add over all pixels — fine at per-frame rates.
    """
    H, W = img.shape
    gr, gc = grid
    th = -(-H // gr)  # ceil
    tw = -(-W // gc)
    pad = ((0, gr * th - H), (0, gc * tw - W))
    x = jnp.pad(img, pad, mode="edge")

    b = jnp.clip(
        jnp.round(x * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1
    )
    tiles = b.reshape(gr, th, gc, tw).transpose(0, 2, 1, 3).reshape(
        gr * gc, th * tw
    )
    tile_ids = jnp.arange(gr * gc, dtype=jnp.int32)[:, None]
    flat = (tile_ids * n_bins + tiles).reshape(-1)
    hist = (
        jnp.zeros((gr * gc * n_bins,), jnp.float32)
        .at[flat].add(1.0)
        .reshape(gr * gc, n_bins)
    )

    area = float(th * tw)
    cl = jnp.maximum(clip_limit * area / n_bins, 1.0)
    excess = jnp.maximum(hist - cl, 0.0).sum(axis=1, keepdims=True)
    hist = jnp.minimum(hist, cl) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=1)
    lut = jnp.clip(cdf * ((n_bins - 1) / area), 0.0, n_bins - 1.0)

    # bilinear blend between the 4 nearest tile LUTs (tile centers at
    # (i+0.5)·tile − 0.5 in padded coords)
    Hp, Wp = x.shape
    yy = (jnp.arange(Hp, dtype=jnp.float32) + 0.5) / th - 0.5
    xx = (jnp.arange(Wp, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, gr - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, gc - 1)
    y1 = jnp.minimum(y0 + 1, gr - 1)
    x1 = jnp.minimum(x0 + 1, gc - 1)
    fy = jnp.clip(yy - jnp.floor(yy), 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - jnp.floor(xx), 0.0, 1.0)[None, :]
    # pixels above/left of the first tile center stick to the edge tile's
    # LUT: fy/fx → 0 there (OpenCV clamps ty1 AFTER computing ty2 = ty1+1,
    # so border pixels weight tile 0 fully). Beyond the last center,
    # y0 == y1 == gr-1 already, so fy is irrelevant.
    fy = jnp.where((yy < 0)[:, None], 0.0, fy)
    fx = jnp.where((xx < 0)[None, :], 0.0, fx)

    def sample(ti_y, ti_x):
        tid = ti_y[:, None] * gc + ti_x[None, :]
        return lut[tid, b]

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    ) / (n_bins - 1)
    return out[:H, :W]


def grid_select_features(
    score: jax.Array,
    occupied_uv: jax.Array,
    occupied_mask: jax.Array,
    *,
    grid_rows: int,
    grid_cols: int,
    per_cell: int,
    min_score: float = 1e-5,
    suppression_radius: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Per-cell top-k corner selection with existing-feature suppression.

    Batched reformulation of featureTracking's per-subregion FAST replenish
    (``featureTracking.cpp:300-385``): instead of detecting only in deficient
    cells, rank the dense score map per cell and mask out pixels near already
    tracked features. Returns (uv (grid_rows·grid_cols·per_cell, 2) float,
    valid mask).
    """
    H, W = score.shape
    ch = H // grid_rows
    cw = W // grid_cols

    # suppress around existing features via a rasterized occupancy box filter
    occ = jnp.zeros((H, W), bool)
    xi = jnp.clip(occupied_uv[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(occupied_uv[:, 1].astype(jnp.int32), 0, H - 1)
    occ = occ.at[yi, xi].max(occupied_mask)
    r = suppression_radius
    occ_dil = box_sum(occ.astype(jnp.float32), 2 * r + 1) > 0
    s = jnp.where(occ_dil, -jnp.inf, score)

    # per-cell top-k as k masked-argmax sweeps (lax.top_k lowers to a full
    # sort on TPU — ~400 ms on (168, 8k) cells; argmax is a plain reduce)
    cells = s[: ch * grid_rows, : cw * grid_cols].reshape(
        grid_rows, ch, grid_cols, cw
    ).transpose(0, 2, 1, 3).reshape(grid_rows * grid_cols, ch * cw)
    cols_i = jnp.arange(cells.shape[1], dtype=jnp.int32)[None, :]
    vlist, ilist = [], []
    x = cells
    for _ in range(per_cell):
        i = jnp.argmax(x, axis=1)
        vlist.append(jnp.take_along_axis(x, i[:, None], axis=1)[:, 0])
        ilist.append(i)
        x = jnp.where(cols_i == i[:, None], -jnp.inf, x)
    vals = jnp.stack(vlist, axis=1)
    flat_idx = jnp.stack(ilist, axis=1).astype(jnp.int32)  # (cells, k)

    cy = flat_idx // cw
    cx = flat_idx % cw
    cell_ids = jnp.arange(grid_rows * grid_cols)[:, None]
    row0 = (cell_ids // grid_cols) * ch
    col0 = (cell_ids % grid_cols) * cw
    uv = jnp.stack(
        [(col0 + cx).astype(jnp.float32), (row0 + cy).astype(jnp.float32)],
        axis=-1,
    ).reshape(-1, 2)
    valid = (vals > min_score).reshape(-1)
    return uv, valid
