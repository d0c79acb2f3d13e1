"""Device-resident bounded voxel map: merge/evict/recenter as pure sorts.

Replaces the reference's rolling 21×21×11 grid of 50 m cubes with host-side
recentering and per-cube voxel filtering (``laserMapping.cpp:74-104`` store,
``:323-507`` recenter, ``:736-801`` insert + re-filter). On TPU there is no
pointer store, and scatter/gather serialize — so the map is a flat
fixed-capacity point tensor whose insert/evict/recenter step is ONE
multi-key ``lax.sort`` pipeline per frame:

1. **Concatenate** the current map (capacity ``cap``) with the new frame's
   world-frame points; drop anything beyond ``drop_radius`` of the current
   pose (≡ the reference only ever matching against the 5×5×3 cube
   neighborhood, ±125 m, ``laserMapping.cpp:512-537``).
2. **Quantize** to leaf cells on a grid whose origin follows the pose in
   coarse steps of ``origin_quantum`` leaves — recentering is pure index
   arithmetic and, because the origin moves by exact leaf multiples, cell
   boundaries never shift under the stored points.
3. **Sort** by (distance-bucket, cell-hash, cell-x*W+y, cell-z, source):
   one stable data-carrying sort. Equal cells land contiguous; near cells
   sort first; within the eviction boundary bucket the hash randomizes which
   cells drop (an unbiased spatial subsample — dropping by raw cell id would
   shave one side off the map); map points precede same-cell new points.
4. **Dedupe + compact**: run starts (first point per cell = the oldest
   observation, matching a voxel-filtered map's ~1 point/leaf density,
   ``laserMapping.cpp:787-801``) are compacted to the front by a second
   stable one-key sort and truncated to ``cap`` — so when the map overflows,
   the points farthest from the pose evict first: the reference's
   recentering shift loops, as a sort key.

Everything is fixed-shape and jit-safe; the map state is just
``(cap, 3) float32 + (cap,) bool`` per feature class, so it composes into
fused ``lax.scan`` chunk programs and shards across meshes by the capacity
axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from .pointcloud import PointBatch

_IMAX = np.int32(2**31 - 1)  # np scalar: no eager backend init at import


def voxel_merge(
    map_xyz: jax.Array,    # (M, 3) world-frame map points
    map_mask: jax.Array,   # (M,)
    new_xyz: jax.Array,    # (S, 3) world-frame new points (one frame's slab)
    new_mask: jax.Array,   # (S,)
    center: jax.Array,     # (3,) current pose position (eviction anchor)
    *,
    leaf: float,
    cap: int,
    drop_radius: float = 150.0,
    origin_quantum: int = 64,
) -> PointBatch:
    """Insert ``new`` into ``map``, return the merged map capped at ``cap``.

    Density is bounded at one point per ``leaf`` cell (first observation
    wins; the incoming slab is itself voxel-mean-downsampled at the same
    leaf, so in-frame averaging still happens). Capacity overflow evicts
    whole cells farthest from ``center``.
    """
    pts = jnp.concatenate([map_xyz, new_xyz])            # (M+S, 3)
    mask = jnp.concatenate([map_mask, new_mask])
    # source flag orders map points before same-cell new points (keep-first
    # = stored map geometry is stable; new observations fill empty cells)
    src = jnp.concatenate([
        jnp.zeros(map_xyz.shape[0], jnp.int32),
        jnp.ones(new_xyz.shape[0], jnp.int32),
    ])

    d2 = jnp.sum((pts - center) ** 2, axis=-1)
    mask = mask & (d2 < drop_radius * drop_radius)

    # leaf-aligned coarse-stepping origin: grid covers center ± 1024·leaf
    oq = origin_quantum * leaf
    origin = (jnp.floor(center / oq) - (1024 // origin_quantum)) * oq  # (3,)
    q = jnp.clip(jnp.floor((pts - origin) / leaf).astype(jnp.int32), 0, 2047)
    kxy = jnp.where(mask, q[:, 0] * 2048 + q[:, 1], _IMAX)
    kz = jnp.where(mask, q[:, 2], _IMAX)

    # eviction priority: quadratic distance buckets (monotonic in distance;
    # ~16 m wide at close range). Per-point, so a cell straddling a bucket
    # boundary may briefly hold 2 points — harmless.
    db = jnp.where(
        mask, jnp.minimum(d2 * (1.0 / 256.0), 127.0).astype(jnp.int32), _IMAX
    )
    h = (
        q[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
        ^ q[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
        ^ q[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
    ).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
    h = jnp.where(mask, h, _IMAX)

    _, _, kxy_s, kz_s, _, xs, ys, zs, m_i = jax.lax.sort(
        (db, h, kxy, kz, src,
         pts[:, 0], pts[:, 1], pts[:, 2], mask.astype(jnp.int32)),
        num_keys=5,
        is_stable=True,
    )
    mask_s = m_i.astype(bool)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool),
         (kxy_s[1:] != kxy_s[:-1]) | (kz_s[1:] != kz_s[:-1])]
    ) & mask_s

    # compact run starts to the front, preserving the priority order
    sel = jnp.where(is_start, jnp.int32(0), jnp.int32(1))
    _, xo, yo, zo, mo = jax.lax.sort(
        (sel, xs, ys, zs, is_start.astype(jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    out_xyz = jnp.stack([xo[:cap], yo[:cap], zo[:cap]], axis=-1)
    return PointBatch(out_xyz, mo[:cap].astype(bool))
