"""Lidar feature extraction (≡ A-LOAM scanRegistration, TPU-native).

Reimplements the reference's curvature-based corner/surface selection
(``src/scanRegistration.cpp:256-407``) over the compacted (ring, W) scan grid:

* curvature = |Σ_{k=±1..5} p[i+k] − 10·p[i]|² along each compacted ring
  (``:256-266``),
* each ring's eligible span [5, count−6] splits into 6 azimuthal sectors with
  the reference's exact integer arithmetic (``:285-287``),
* per sector, greedy descending-curvature corner picking (≤2 sharp, ≤20
  less-sharp, curvature > 0.1) and ascending flat picking (≤4, curvature < 0.1)
  with ±5-neighbor suppression that stops at >0.05 m² gaps (``:291-398``).

The greedy pick-and-suppress order is inherently sequential, so it runs as a
``lax.scan`` with a *fixed* trip count (sectors × picks), each step a masked
argmax over the (rings, W) plane — wide vector work per step, no dynamic
shapes. Sector-boundary suppression carries across sectors exactly like the
reference's ring-global ``cloudNeighborPicked``.

Everything labeled ≤ 0 feeds the less-flat cloud, voxel-downsampled per ring at
0.2 m leaf (``:401-407``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pointcloud import CompactScan, voxel_downsample_batched


class FeatureCloud(NamedTuple):
    """Padded feature point set with per-point ring id and scan time."""

    xyz: jax.Array       # (N, 3)
    ring: jax.Array      # (N,) int32
    rel_time: jax.Array  # (N,) float32 in [0, 1)
    mask: jax.Array      # (N,) bool


class ScanFeatures(NamedTuple):
    sharp: FeatureCloud       # ≤ 2/sector corners
    less_sharp: FeatureCloud  # ≤ 20/sector corners (superset of sharp)
    flat: FeatureCloud        # ≤ 4/sector planar points
    less_flat: FeatureCloud   # voxel-downsampled remainder (labels ≤ 0)


def _shift(x: jax.Array, k: int, fill) -> jax.Array:
    """Shift along axis 1 by k (positive → pull from the right)."""
    if k == 0:
        return x
    pad = jnp.full_like(x[:, :abs(k)], fill)
    if k > 0:
        return jnp.concatenate([x[:, k:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :k]], axis=1)


def curvature(cs: CompactScan) -> tuple[jax.Array, jax.Array]:
    """Per-point curvature + eligibility over the compacted rings.

    Returns (curv (R, W) float32, eligible (R, W) bool). Eligible points are
    those with 5 full neighbors on each side inside the ring, on rings with
    count ≥ 17 (the reference skips rings with end−start < 6, ``:280-281``).
    """
    R, W = cs.valid.shape
    acc = -10.0 * cs.xyz
    for k in list(range(-5, 0)) + list(range(1, 6)):
        acc = acc + _shift(cs.xyz, k, 0.0)
    curv = jnp.sum(acc * acc, axis=-1)

    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    count = cs.count[:, None]
    eligible = (idx >= 5) & (idx <= count - 6) & (count >= 17)
    return curv, eligible


def _suppression_reach(cs: CompactScan) -> tuple[jax.Array, jax.Array]:
    """How far ±suppression extends from each point before a >0.05 m² jump
    between consecutive returns stops it (``:319-342``). Returns
    (reach_left, reach_right), each (R, W) int32 in [0, 5]."""
    nxt = _shift(cs.xyz, 1, jnp.inf)
    gap_ok = (jnp.sum((nxt - cs.xyz) ** 2, axis=-1) <= 0.05) & cs.valid & _shift(
        cs.valid, 1, False
    )
    # reach_right[i] = longest run of ok gaps starting at i, capped at 5
    run = gap_ok.astype(jnp.int32)
    reach_r = run.copy()
    acc = run
    for k in range(1, 5):
        acc = acc & _shift(gap_ok, k, False).astype(jnp.int32)
        reach_r = reach_r + acc
    # reach_left[i] = reach over gaps (i-1, i-2, ...): same runs shifted
    gap_ok_l = _shift(gap_ok, -1, False)  # gap between i-1 and i
    run = gap_ok_l.astype(jnp.int32)
    reach_l = run.copy()
    acc = run
    for k in range(1, 5):
        acc = acc & _shift(gap_ok_l, -k, False).astype(jnp.int32)
        reach_l = reach_l + acc
    return reach_l, reach_r


def _sector_bounds(count: jax.Array, n_sectors: int, j: int) -> tuple[jax.Array, jax.Array]:
    """Reference sector arithmetic (``:285-287``): for ring span
    [start, end] = [5, count-6], sector j covers
    [start + (end-start)*j/6, start + (end-start)*(j+1)/6 - 1] (int division)."""
    span = jnp.maximum(count - 11, 0)
    sp = 5 + span * j // n_sectors
    ep = 5 + span * (j + 1) // n_sectors - 1
    return sp, ep


def extract_features(
    cs: CompactScan,
    *,
    n_sectors: int = 6,
    max_sharp: int = 2,
    max_less_sharp: int = 20,
    max_flat: int = 4,
    edge_gate: float = 0.1,
    surf_gate: float = 0.1,
    surf_leaf: float = 0.2,
    max_less_flat_per_ring: int = 512,
) -> ScanFeatures:
    R, W = cs.valid.shape
    curv, eligible = curvature(cs)
    reach_l, reach_r = _suppression_reach(cs)
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]

    NEG = jnp.float32(-1e30)
    POS = jnp.float32(1e30)

    def suppress(avail, pick, on):
        """Clear availability in [pick-reach_l[pick], pick+reach_r[pick]]."""
        rl = jnp.take_along_axis(reach_l, pick[:, None], axis=1)
        rr = jnp.take_along_axis(reach_r, pick[:, None], axis=1)
        within = (idx >= pick[:, None] - rl) & (idx <= pick[:, None] + rr)
        hit = within | (idx == pick[:, None])
        return avail & ~(hit & on[:, None])

    def pick_step_max(carry, j_and_k):
        avail, sector_mask = carry
        score = jnp.where(avail & sector_mask, curv, NEG)
        pick = jnp.argmax(score, axis=1)
        best = jnp.take_along_axis(score, pick[:, None], axis=1)[:, 0]
        ok = best > edge_gate
        avail = suppress(avail, pick, ok)
        return (avail, sector_mask), (pick, ok)

    def pick_step_min(carry, _):
        avail, sector_mask = carry
        score = jnp.where(avail & sector_mask, curv, POS)
        pick = jnp.argmin(score, axis=1)
        best = jnp.take_along_axis(score, pick[:, None], axis=1)[:, 0]
        ok = best < surf_gate
        avail = suppress(avail, pick, ok)
        return (avail, sector_mask), (pick, ok)

    # Sequential over sectors (suppression crosses boundaries, like the
    # ring-global cloudNeighborPicked), fixed trip counts inside.
    avail = eligible & cs.valid
    corner_picks, corner_ok = [], []
    flat_picks, flat_ok = [], []
    corner_label = jnp.zeros((R, W), dtype=bool)

    for j in range(n_sectors):
        sp, ep = _sector_bounds(cs.count, n_sectors, j)
        sector_mask = (idx >= sp[:, None]) & (idx <= ep[:, None])
        # corners: descending curvature
        (avail, _), (cp, cok) = jax.lax.scan(
            pick_step_max, (avail, sector_mask), jnp.arange(max_less_sharp)
        )
        corner_picks.append(cp.T)  # (R, K)
        corner_ok.append(cok.T)
        corner_label = corner_label | (
            jnp.zeros((R, W), bool)
            .at[jnp.arange(R)[:, None], cp.T]
            .max(cok.T)
        )
        # flats: ascending curvature
        (avail, _), (fp, fok) = jax.lax.scan(
            pick_step_min, (avail, sector_mask), jnp.arange(max_flat)
        )
        flat_picks.append(fp.T)
        flat_ok.append(fok.T)

    corner_picks = jnp.stack(corner_picks, axis=1)  # (R, S, K)
    corner_ok = jnp.stack(corner_ok, axis=1)
    flat_picks = jnp.stack(flat_picks, axis=1)
    flat_ok = jnp.stack(flat_ok, axis=1)

    ring_ids = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None, None], corner_picks.shape
    )

    def gather(picks, ok, ring_b):
        flatp = picks.reshape(R, -1)
        xyz = jnp.take_along_axis(cs.xyz, flatp[..., None], axis=1).reshape(-1, 3)
        rt = jnp.take_along_axis(cs.rel_time, flatp, axis=1).reshape(-1)
        return FeatureCloud(xyz, ring_b.reshape(-1), rt, ok.reshape(-1))

    less_sharp = gather(corner_picks, corner_ok, ring_ids)
    sharp = gather(
        corner_picks[:, :, :max_sharp],
        corner_ok[:, :, :max_sharp],
        ring_ids[:, :, :max_sharp],
    )
    flat = gather(flat_picks, flat_ok, ring_ids[:, :, :max_flat])

    # less-flat: everything not labeled a corner (labels ≤ 0 include flats,
    # scanRegistration.cpp:391-398), voxel-downsampled per ring.
    lf_mask = cs.valid & ~corner_label
    ds = voxel_downsample_batched(
        cs.xyz, lf_mask, leaf=surf_leaf, max_out=max_less_flat_per_ring
    )
    lf_ring = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, max_less_flat_per_ring)
    )
    less_flat = FeatureCloud(
        ds.xyz.reshape(-1, 3),
        lf_ring.reshape(-1),
        jnp.zeros((R * max_less_flat_per_ring,), jnp.float32),
        ds.mask.reshape(-1),
    )
    return ScanFeatures(sharp, less_sharp, flat, less_flat)
