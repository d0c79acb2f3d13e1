"""Point-cloud tensor schema and kernels.

TPU-first replacement for PCL containers and filters: clouds are fixed-shape
tensors with validity masks (XLA needs static shapes; the reference's dynamic
``push_back`` style cannot compile). Three layouts:

* raw padded batch  ``PointBatch``: (N, 3) xyz + (N,) mask [+ aux channels]
* dense range image ``RangeImage``: (rings, W) grid in scan order — the
  TPU-native equivalent of A-LOAM's per-ring concatenated cloud
  (``scanRegistration.cpp:160-252``); azimuth column index encodes relative
  scan time exactly like the reference packs ``scanID + 0.1*relTime`` into
  intensity (``scanRegistration.cpp:238-239``).
* compacted rings: valid points shifted to the front of each ring row so the
  ±5-neighbor curvature stencil sees *consecutive returns*, matching the
  reference's compacted per-ring indexing (``scanRegistration.cpp:246-266``).

The voxel-grid downsample (≡ pcl::VoxelGrid, ``scanRegistration.cpp:401-407``)
is sort-based: hash → sort by cell id → segment-mean over runs. No host loops,
no dynamic allocation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PointBatch(NamedTuple):
    """Fixed-size padded point set."""

    xyz: jax.Array   # (N, 3) float32
    mask: jax.Array  # (N,)   bool — True for real points

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]


class RangeImage(NamedTuple):
    """Dense (rings, W) scan grid in azimuth scan order."""

    xyz: jax.Array       # (R, W, 3)
    valid: jax.Array     # (R, W) bool
    rel_time: jax.Array  # (R, W) float32, in [0, 1): fraction of scan period


class CompactScan(NamedTuple):
    """Per-ring front-compacted points (scan order preserved)."""

    xyz: jax.Array       # (R, W, 3)
    valid: jax.Array     # (R, W) bool; valid[r, :count[r]] all True
    rel_time: jax.Array  # (R, W)
    count: jax.Array     # (R,) int32


def ring_index_hdl(xyz: jax.Array, n_scans: int) -> tuple[jax.Array, jax.Array]:
    """Vertical-angle → ring id, vectorized over (N, 3) points.

    Same formulas as the reference (``scanRegistration.cpp:168-199``) for
    16 / 32 / 64-beam Velodynes, including the HDL-64 [2°, -24.33°] split and
    its >50 outlier-ring rejection.

    Returns (ring_id int32, in_fov bool).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    angle = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    if n_scans == 16:
        ring = jnp.floor((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n_scans - 1)
    elif n_scans == 32:
        ring = jnp.floor((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        ok = (ring >= 0) & (ring <= n_scans - 1)
    elif n_scans == 64:
        upper = jnp.floor((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        lower = n_scans // 2 + jnp.floor((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        ring = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring <= 50)
    else:
        raise ValueError(f"unsupported n_scans={n_scans}")
    return ring, ok


def build_range_image(
    points: jax.Array,
    mask: jax.Array,
    *,
    n_scans: int,
    width: int,
    min_range: float,
    max_range: float = 1e9,
) -> RangeImage:
    """Raw (N, 3) cloud → dense (rings, W) scan grid.

    Replaces the ring-bucketing loop of ``scanRegistration.cpp:160-241``:
    azimuth directly indexes the W columns (the reference's ``relTime`` is the
    same azimuth fraction), the min-range filter replaces
    ``removeClosedPointCloud`` (``:85-112``). Collisions within a cell keep the
    nearest return (scatter-min on range).
    """
    x, y = points[..., 0], points[..., 1]
    rng_sq = jnp.sum(points * points, axis=-1)
    ring, in_fov = ring_index_hdl(points, n_scans)
    ok = (
        mask
        & in_fov
        & (rng_sq > min_range * min_range)
        & (rng_sq < max_range * max_range)
        & jnp.all(jnp.isfinite(points), axis=-1)
    )

    # Azimuth decreasing-with-time for Velodyne (clockwise): ori = -atan2(y, x)
    # (scanRegistration.cpp:141). Map [-pi, pi) → [0, W).
    ori = -jnp.arctan2(y, x)
    col = jnp.floor((ori + jnp.pi) / (2.0 * jnp.pi) * width).astype(jnp.int32)
    col = jnp.clip(col, 0, width - 1)
    ring_c = jnp.clip(ring, 0, n_scans - 1)

    flat_idx = jnp.where(ok, ring_c * width + col, n_scans * width)  # pad cell

    # Nearest-return-wins scatter: min range per cell, then match.
    big = jnp.float32(1e30)
    rng_flat = jnp.full((n_scans * width + 1,), big, dtype=jnp.float32)
    rng_flat = rng_flat.at[flat_idx].min(jnp.where(ok, rng_sq, big))
    winner = ok & (rng_flat[flat_idx] == rng_sq)

    xyz_grid = jnp.zeros((n_scans * width + 1, 3), dtype=points.dtype)
    xyz_grid = xyz_grid.at[jnp.where(winner, flat_idx, n_scans * width)].set(
        jnp.where(winner[..., None], points, 0.0)
    )
    valid_grid = jnp.zeros((n_scans * width + 1,), dtype=bool)
    valid_grid = valid_grid.at[jnp.where(winner, flat_idx, n_scans * width)].set(winner)

    xyz_img = xyz_grid[: n_scans * width].reshape(n_scans, width, 3)
    valid_img = valid_grid[: n_scans * width].reshape(n_scans, width)
    rel_time = jnp.broadcast_to(
        (jnp.arange(width, dtype=jnp.float32) + 0.5) / width, (n_scans, width)
    )
    return RangeImage(xyz_img, valid_img, rel_time)


def build_compact_scan(
    points: jax.Array,
    mask: jax.Array,
    *,
    n_scans: int,
    width: int,
    min_range: float,
    max_range: float = 1e9,
) -> CompactScan:
    """Raw (N, 3) cloud → front-compacted (rings, W) scan, one fused pass.

    Functionally ``compact_rings(build_range_image(...))`` but TPU-shaped:
    the scatter-min / argsort / take_along_axis chain of the two-step path
    lowers to ~12 ms of serialized 131k-element gather/scatter fusions per
    frame; this version carries the point data *through* one multi-key
    ``lax.sort`` (sorts are fast on TPU — bitonic, fully vectorized) and ends
    with a single collision-free scatter into the (R, W) grid.

    Steps:
      1. ring id / azimuth column / validity — elementwise
         (``scanRegistration.cpp:160-241`` semantics, nearest return wins a
         (ring, col) cell),
      2. one stable 5-operand sort by (cell key, range²): each cell's winner
         becomes the first point of its key run; winners are ring-major,
         azimuth-ordered — exactly compacted scan order,
      3. within-ring destination = winner rank − ring start (one-hot reduce,
         no gathers), then one scatter-set of the winner rows.
    """
    x, y = points[..., 0], points[..., 1]
    rng_sq = jnp.sum(points * points, axis=-1)
    ring, in_fov = ring_index_hdl(points, n_scans)
    ok = (
        mask
        & in_fov
        & (rng_sq > min_range * min_range)
        & (rng_sq < max_range * max_range)
        & jnp.all(jnp.isfinite(points), axis=-1)
    )
    ori = -jnp.arctan2(y, x)
    col = jnp.floor((ori + jnp.pi) / (2.0 * jnp.pi) * width).astype(jnp.int32)
    col = jnp.clip(col, 0, width - 1)
    ring_c = jnp.clip(ring, 0, n_scans - 1)
    sentinel = n_scans * width
    key = jnp.where(ok, ring_c * width + col, sentinel)

    key_s, _, xs, ys, zs = jax.lax.sort(
        (key, rng_sq, points[..., 0], points[..., 1], points[..., 2]),
        num_keys=2,
        is_stable=True,
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    winner = first & (key_s < sentinel)
    ring_s = key_s // width

    rings_iota = jnp.arange(n_scans, dtype=jnp.int32)
    onehot = (ring_s[:, None] == rings_iota[None, :]) & winner[:, None]
    count = jnp.sum(onehot, axis=0, dtype=jnp.int32)           # (R,)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(count)[:-1]]
    )
    # start of my ring, per point — one-hot reduce instead of a gather
    start_pp = jnp.sum(
        onehot.astype(jnp.float32) * starts.astype(jnp.float32)[None, :],
        axis=1,
    ).astype(jnp.int32)
    wrank = jnp.cumsum(winner.astype(jnp.int32)) - 1
    pos = wrank - start_pp
    dst = jnp.where(winner & (pos < width), ring_s * width + pos, sentinel)

    rel = (jnp.asarray(key_s % width, jnp.float32) + 0.5) / width
    rows = jnp.stack([xs, ys, zs, rel], axis=-1)
    grid = jnp.zeros((sentinel + 1, 4), dtype=points.dtype).at[dst].set(
        jnp.where(winner[:, None], rows, 0.0)
    )
    grid = grid[:sentinel].reshape(n_scans, width, 4)
    idx = jnp.arange(width, dtype=jnp.int32)[None, :]
    valid = idx < count[:, None]
    return CompactScan(grid[..., :3], valid, grid[..., 3], count)


def compact_rings(ri: RangeImage) -> CompactScan:
    """Shift valid cells to the front of each ring row, preserving scan order.

    After compaction, index-adjacent entries are consecutive returns, so the
    curvature stencil over ±5 neighbors reproduces the reference's compacted
    per-ring cloud semantics (``scanRegistration.cpp:256-266``).
    """
    R, W = ri.valid.shape
    # Stable sort by (not valid): valid points keep order, move to front.
    order = jnp.argsort(~ri.valid, axis=1, stable=True)
    xyz = jnp.take_along_axis(ri.xyz, order[..., None], axis=1)
    rel_time = jnp.take_along_axis(ri.rel_time, order, axis=1)
    count = jnp.sum(ri.valid, axis=1).astype(jnp.int32)
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = idx < count[:, None]
    return CompactScan(xyz, valid, rel_time, count)


def voxel_downsample(
    xyz: jax.Array,
    mask: jax.Array,
    *,
    leaf: float,
    max_out: int,
    origin: float | None = None,
) -> PointBatch:
    """Voxel-grid filter: mean of points per occupied voxel (≡ pcl::VoxelGrid).

    Sort-based segment mean:
      1. quantize to voxel coords, linearize to a cell id
      2. sort points by cell id (invalid → +inf id, sorts to back)
      3. runs of equal id are one voxel → scatter-add into the run-start slot
      4. compact run starts to the front, divide by counts

    Fixed output budget ``max_out``; if more voxels are occupied the extras
    are dropped deterministically but UNBIASED: voxels are ordered by a hash
    of their cell id, so an overflow drops a pseudo-random spatial subsample
    (ordering by raw cell id would drop one whole side of the cloud — a
    systematic bias that corrupts downstream pose solves).

    Cell ids use exact int32 keys (JAX default disables int64): a
    lexicographic sort over (hash, qx*2048+qy, qz) — the trailing exact keys
    keep equal cells contiguous even under hash collisions. Coordinate
    coverage is ±1024·leaf around ``origin`` (204 m at 0.2 m leaf), clamped
    beyond that.
    """
    if origin is None:
        origin = -1024.0 * leaf  # center the 2048-cell coverage on the sensor
    q = jnp.clip(
        jnp.floor((xyz - origin) / leaf).astype(jnp.int32), 0, 2047
    )
    kxy = jnp.where(mask, q[:, 0] * 2048 + q[:, 1], jnp.int32(2**31 - 1))
    kz = q[:, 2]
    h = (
        q[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
        ^ q[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
        ^ q[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
    ).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
    h = jnp.where(mask, h, jnp.int32(2**31 - 1))  # invalid sorts to the back

    # One stable multi-key sort carrying the point data (argsort+gather chains
    # lower to slow serialized gathers on TPU; data-carrying sorts are fast).
    _, kxy_s, kz_s, xs, ys, zs, mask_i = jax.lax.sort(
        (h, kxy, kz, xyz[:, 0], xyz[:, 1], xyz[:, 2], mask.astype(jnp.int32)),
        num_keys=3,
        is_stable=True,
    )
    xyz_s = jnp.stack([xs, ys, zs], axis=-1)
    mask_s = mask_i.astype(bool)

    is_start = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (kxy_s[1:] != kxy_s[:-1]) | (kz_s[1:] != kz_s[:-1]),
        ]
    ) & mask_s
    # run id per point = number of run-starts before it (inclusive) - 1
    run_id = jnp.cumsum(is_start) - 1
    run_id = jnp.where(mask_s, run_id, max_out)  # invalid → overflow bucket
    run_id = jnp.minimum(run_id, max_out)

    mf = mask_s.astype(jnp.float32)
    if jax.default_backend() == "tpu":
        from . import pallas_segsum

        vals = jnp.stack(
            [jnp.where(mask_s, xs, 0.0), jnp.where(mask_s, ys, 0.0),
             jnp.where(mask_s, zs, 0.0), mf],
            axis=0,
        )                                                # (4, N)
        acc = pallas_segsum.segment_sum(
            run_id, vals, n_segments=max_out + 1
        )                                                # (4, max_out+1)
        sums = acc[:3, :max_out].T
        cnts = acc[3, :max_out]
    else:
        sums = jnp.zeros((max_out + 1, 3), dtype=xyz.dtype)
        sums = sums.at[run_id].add(jnp.where(mask_s[:, None], xyz_s, 0.0))
        cnts_full = jnp.zeros((max_out + 1,), dtype=jnp.float32)
        cnts_full = cnts_full.at[run_id].add(mf)
        sums = sums[:max_out]
        cnts = cnts_full[:max_out]

    out_mask = cnts > 0
    out_xyz = sums / jnp.maximum(cnts[:, None], 1.0)
    return PointBatch(out_xyz, out_mask)


def voxel_downsample_batched(
    xyz: jax.Array,      # (R, W, 3)
    mask: jax.Array,     # (R, W)
    *,
    leaf: float,
    max_out: int,
    origin: float | None = None,
) -> PointBatch:
    """Per-row voxel-grid filter: ``voxel_downsample`` vmapped over rows, but
    with the segment reduction as one batched Pallas one-hot contraction on
    TPU (the XLA scatter-add serializes — ~2.4 ms/frame for the 64-ring
    less-flat filter; the MXU form is ~20×). Returns a batched PointBatch
    ((R, max_out, 3), (R, max_out))."""
    R, W = mask.shape
    if origin is None:
        origin = -1024.0 * leaf
    q = jnp.clip(jnp.floor((xyz - origin) / leaf).astype(jnp.int32), 0, 2047)
    kxy = jnp.where(mask, q[..., 0] * 2048 + q[..., 1], jnp.int32(2**31 - 1))
    kz = q[..., 2]
    kxy_s, kz_s, xs, ys, zs, m_i = jax.lax.sort(
        (kxy, kz, xyz[..., 0], xyz[..., 1], xyz[..., 2],
         mask.astype(jnp.int32)),
        num_keys=2, is_stable=True, dimension=1,
    )
    mask_s = m_i.astype(bool)
    is_start = jnp.concatenate(
        [
            jnp.ones((R, 1), bool),
            (kxy_s[:, 1:] != kxy_s[:, :-1]) | (kz_s[:, 1:] != kz_s[:, :-1]),
        ],
        axis=1,
    ) & mask_s
    run_id = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    run_id = jnp.where(mask_s, jnp.minimum(run_id, max_out), max_out)

    mf = mask_s.astype(jnp.float32)
    if jax.default_backend() == "tpu":
        from . import pallas_segsum

        vals = jnp.stack([xs, ys, zs, mf], axis=1)           # (R, 4, W)
        sums = pallas_segsum.segment_sum_batched(
            run_id, vals, n_segments=max_out + 1
        )                                                    # (R, 4, max_out+1)
        sum_xyz = sums[:, :3, :max_out].transpose(0, 2, 1)
        cnts = sums[:, 3, :max_out]
    else:
        vals = jnp.stack([xs, ys, zs, mf], axis=-1)          # (R, W, 4)
        acc = jnp.zeros((R, max_out + 1, 4), jnp.float32).at[
            jnp.arange(R)[:, None], run_id
        ].add(jnp.where(mask_s[..., None], vals, 0.0))
        sum_xyz = acc[:, :max_out, :3]
        cnts = acc[:, :max_out, 3]

    out_mask = cnts > 0
    out_xyz = sum_xyz / jnp.maximum(cnts[..., None], 1.0)
    return PointBatch(out_xyz, out_mask)


# ---------------------------------------------------------------------------
# Polar packed ingest: the minimum-byte host→device scan representation.
#
# The raw-scan upload dominates the tunneled-TPU pipeline (~80 MB/s link), and
# a lidar return is intrinsically polar: it lies near a known ring elevation
# and a known azimuth column. Encoding (range, small angular offsets) instead
# of xyz needs 4 bytes/cell on the dense (ring, W) grid — 2/3 of the uint16
# xyz encoding at full capacity — and the decoded grid is *already* the range
# image, so the device skips the global 131k-point compaction sort of
# ``build_compact_scan`` and does a cheap per-ring row sort instead.
#
# Precision (HDL-64, W=2048): range 2 mm, azimuth offset (π/W)/127 ≈ 12 µrad
# (1.5 mm @ 120 m), elevation offset (0.25°)/127 ≈ 34 µrad (4.1 mm @ 120 m) —
# all at or below the 3.9 mm of the uint16 xyz path and ~20× below lidar
# noise. Collisions keep the nearest return, exactly like
# ``build_range_image`` (≡ scanRegistration.cpp:160-241 ring bucketing).
# ---------------------------------------------------------------------------

POLAR_RANGE_Q = 131.072 / 65536.0  # 2 mm over [0, 131) m; 0 = empty cell


def ring_elevations(n_scans: int):
    """(nominal elevation rad (R,), max half-spacing rad) for the ring
    formulas of ``ring_index_hdl`` (``scanRegistration.cpp:168-199``)."""
    i = np.arange(n_scans, dtype=np.float64)
    if n_scans == 16:
        nom, half = -15.0 + 2.0 * i, 1.0
    elif n_scans == 32:
        nom, half = (i + 0.5) * 4.0 / 3.0 - 92.0 / 3.0, 2.0 / 3.0
    elif n_scans == 64:
        nom = np.where(i < 32, 2.0 - i / 3.0, -8.83 - (i - 32) / 2.0)
        half = 0.25
    else:
        raise ValueError(f"unsupported n_scans={n_scans}")
    return np.radians(nom).astype(np.float32), float(np.radians(half))


def _ring_index_np(xyz, n_scans: int):
    """numpy twin of ``ring_index_hdl`` (host packer side)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    angle = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    if n_scans == 16:
        ring = np.floor((angle + 15.0) / 2.0 + 0.5).astype(np.int32)
        ok = (ring >= 0) & (ring <= n_scans - 1)
    elif n_scans == 32:
        ring = np.floor((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(np.int32)
        ok = (ring >= 0) & (ring <= n_scans - 1)
    elif n_scans == 64:
        upper = np.floor((2.0 - angle) * 3.0 + 0.5).astype(np.int32)
        lower = 32 + np.floor((-8.83 - angle) * 2.0 + 0.5).astype(np.int32)
        ring = np.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring <= 50)
    else:
        raise ValueError(f"unsupported n_scans={n_scans}")
    return np.clip(ring, 0, n_scans - 1), ok


def pack_polar_scan(
    pts,
    *,
    n_scans: int,
    width: int,
    min_range: float,
    max_range: float,
    channels: int = 2,
):
    """Host-side: raw (n, ≥3) float scan → (R, W, channels) uint16 polar image.

    Channel 0 = quantized range (0 ⇒ empty cell); channel 1 = packed int8
    angular offsets ``(el_off << 8) | az_off`` (biased by 128) relative to the
    cell's ring elevation / azimuth-bin center. Nearest return wins a cell.
    channels=1 drops the offsets (2 B/cell — the minimum-transfer mode;
    decode reconstructs at cell centers, see ``polar_to_compact``).
    """
    xyz = np.asarray(pts)[:, :3].astype(np.float32)
    rng = np.sqrt(np.sum(xyz * xyz, axis=1))
    ring, ok = _ring_index_np(xyz, n_scans)
    ok = (
        ok
        & (rng > min_range)
        & (rng < max_range)
        & np.isfinite(xyz).all(axis=1)
    )
    ori = -np.arctan2(xyz[:, 1], xyz[:, 0])
    col = np.clip(
        np.floor((ori + np.pi) / (2.0 * np.pi) * width).astype(np.int32),
        0, width - 1,
    )

    flat = ring * width + col
    rmin = np.full((n_scans * width,), np.inf, np.float32)
    np.minimum.at(rmin, flat[ok], rng[ok])
    win = ok & (rmin[flat] == rng)

    nominal, el_half = ring_elevations(n_scans)
    az_q = np.pi / width / 127.0
    el_q = el_half / 127.0

    elev = np.arctan2(xyz[:, 2], np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2))
    d_el = elev - nominal[ring]
    d_az = ori - (-np.pi + (col.astype(np.float32) + 0.5)
                  * (2.0 * np.pi / width))
    qel = np.clip(np.rint(d_el / el_q), -127, 127).astype(np.int32) + 128
    qaz = np.clip(np.rint(d_az / az_q), -127, 127).astype(np.int32) + 128
    qr = np.clip(np.rint(rng / POLAR_RANGE_Q), 1, 65535).astype(np.uint16)

    img = np.zeros((n_scans * width, channels), np.uint16)
    img[flat[win], 0] = qr[win]
    if channels >= 2:
        img[flat[win], 1] = ((qel[win] << 8) | qaz[win]).astype(np.uint16)
    return img.reshape(n_scans, width, channels)


def polar_to_compact(
    img: jax.Array,  # (R, W, 2|1) uint16 from pack_polar_scan
    *,
    n_scans: int,
    width: int,
    min_range: float,
    max_range: float,
) -> CompactScan:
    """Device-side decode: polar image → front-compacted scan.

    The grid is already in (ring, azimuth) scan order, so compaction is one
    per-ring data-carrying row sort (no global sort, no gathers).

    A single-channel image (range only, 2 B/cell — half the tunnel bytes)
    decodes at the nominal ring elevation / azimuth-bin center: a ≤0.09°
    angular quantization (≈9 cm tangential at 60 m, zero-mean)."""
    nominal, el_half = ring_elevations(n_scans)
    az_q = np.pi / width / 127.0
    el_q = el_half / 127.0

    rq = img[..., 0].astype(jnp.float32)
    r = rq * POLAR_RANGE_Q
    colf = jnp.arange(width, dtype=jnp.float32)[None, :]
    if img.shape[-1] >= 2:
        packed = img[..., 1].astype(jnp.int32)
        az_off = (packed & 0xFF).astype(jnp.float32) - 128.0
        el_off = (packed >> 8).astype(jnp.float32) - 128.0
        ori = (-jnp.pi + (colf + 0.5) * (2.0 * jnp.pi / width)
               + az_off * az_q)
        el = jnp.asarray(nominal)[:, None] + el_off * el_q
    else:
        ori = jnp.broadcast_to(
            -jnp.pi + (colf + 0.5) * (2.0 * jnp.pi / width), rq.shape
        )
        el = jnp.broadcast_to(jnp.asarray(nominal)[:, None], rq.shape)
    d = r * jnp.cos(el)
    # ori = -atan2(y, x)  ⇒  x = d·cos(ori), y = -d·sin(ori)
    x = d * jnp.cos(ori)
    y = -d * jnp.sin(ori)
    z = r * jnp.sin(el)
    valid = (rq > 0.5) & (r > min_range) & (r < max_range)
    rel = jnp.broadcast_to((colf + 0.5) / width, valid.shape)

    inv = (~valid).astype(jnp.int32)
    _, xs, ys, zs, rel_s, v_i = jax.lax.sort(
        (inv, x, y, z, rel, valid.astype(jnp.int32)),
        num_keys=1, is_stable=True, dimension=1,
    )
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    idx = jnp.arange(width, dtype=jnp.int32)[None, :]
    return CompactScan(
        jnp.stack([xs, ys, zs], axis=-1),
        idx < count[:, None],
        rel_s,
        count,
    )


def pad_points(xyz, n: int, extra=None):
    """Host helper: pad an (m, 3) array [+ aux arrays] to capacity n with mask."""
    import numpy as np

    m = xyz.shape[0]
    assert m <= n, f"cloud of {m} points exceeds capacity {n}"
    out = np.zeros((n, 3), dtype=np.float32)
    out[:m] = xyz[:, :3]
    mask = np.zeros((n,), dtype=bool)
    mask[:m] = True
    if extra is not None:
        eout = np.zeros((n, *extra.shape[1:]), dtype=extra.dtype)
        eout[:m] = extra
        return out, mask, eout
    return out, mask
