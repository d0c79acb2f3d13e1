"""Batched nearest-neighbor search on the MXU — the kd-tree replacement.

All of the reference's FLANN kd-tree queries (scan-to-scan corner/surf
association ``laserOdometry.cpp:384-561``, map association
``laserMapping.cpp:577-687``, visual depth association ``Frontend.cpp:237-296``)
become masked distance-matrix reductions: ``D = |q|² + |c|² − 2 q·cᵀ`` computed
as one HIGHEST-precision matmul, followed by masked argmin / top-k. Pointer
trees don't map to TPU; a few hundred MFLOPs of dense distances do — at HBM
bandwidth this is faster than the tree walk it replaces, and it batches over
all queries at once.

The A-LOAM ring-structured second/third-point searches are exact masked argmin
reformulations (see ``associate_edges`` / ``associate_planes``): scanning the
ring-ordered array with break-at-±2.5-rings is equivalent to an argmin over
{|ring − ring₀| ≤ 2.5} with the same-ring/different-ring predicates.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

_BIG = np.float32(1e30)  # np scalar: no eager backend init at import


def pairwise_sqdist(
    q: jax.Array, c: jax.Array, c_mask: jax.Array | None = None
) -> jax.Array:
    """(Q, 3) × (C, 3) → (Q, C) squared distances; masked cands → +inf.

    HIGHEST matmul precision: bf16 passes would corrupt distances by O(|q||c|·4e-3)
    ≫ the 25 m² association gates at lidar ranges.
    """
    qq = jnp.sum(q * q, axis=-1, keepdims=True)          # (Q, 1)
    cc = jnp.sum(c * c, axis=-1)[None, :]                # (1, C)
    qc = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(qq + cc - 2.0 * qc, 0.0)
    if c_mask is not None:
        d = jnp.where(c_mask[None, :], d, _BIG)
    return d


def masked_argmin(d: jax.Array, extra_mask: jax.Array | None = None):
    """Per-row argmin with optional (Q, C) mask → (idx (Q,), val (Q,))."""
    if extra_mask is not None:
        d = jnp.where(extra_mask, d, _BIG)
    idx = jnp.argmin(d, axis=-1)
    val = jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0]
    return idx, val


class EdgeAssoc(NamedTuple):
    """Indices into the candidate cloud for the point-to-line factor."""

    j0: jax.Array    # nearest neighbor
    j2: jax.Array    # nearest on a different ring within ±2.5
    valid: jax.Array


class PlaneAssoc(NamedTuple):
    j0: jax.Array    # nearest neighbor
    j2: jax.Array    # nearest other point on the same ring
    j3: jax.Array    # nearest on a different ring within ±2.5
    valid: jax.Array


def associate_edges(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_xyz: jax.Array,
    c_ring: jax.Array,
    c_mask: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> EdgeAssoc:
    """Corner association (≡ laserOdometry.cpp:384-465).

    j0 = NN (gate 25 m²); j2 = closest candidate on a different ring within
    ±2.5 rings of ring(j0) (gate 25 m²).
    """
    d = pairwise_sqdist(q_xyz, c_xyz, c_mask)
    j0, d0 = masked_argmin(d)
    r0 = c_ring[j0]                                       # (Q,)
    ring_diff = jnp.abs(
        c_ring[None, :].astype(jnp.float32) - r0[:, None].astype(jnp.float32)
    )
    m2 = (ring_diff > 0.0) & (ring_diff <= nearby_scan)
    j2, d2 = masked_argmin(d, m2)
    valid = (
        q_mask
        & (d0 < dist_sq_threshold)
        & (d2 < dist_sq_threshold)
    )
    return EdgeAssoc(j0, j2, valid)


def associate_planes(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_xyz: jax.Array,
    c_ring: jax.Array,
    c_mask: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> PlaneAssoc:
    """Surf association (≡ laserOdometry.cpp:468-561).

    j0 = NN; j2 = closest *other* point on the same ring; j3 = closest on a
    different ring within ±2.5. All gated at 25 m².
    """
    d = pairwise_sqdist(q_xyz, c_xyz, c_mask)
    j0, d0 = masked_argmin(d)
    r0 = c_ring[j0]
    ring_diff = (
        c_ring[None, :].astype(jnp.float32) - r0[:, None].astype(jnp.float32)
    )
    col = jnp.arange(c_xyz.shape[0], dtype=j0.dtype)[None, :]
    same_ring = (jnp.abs(ring_diff) == 0.0) & (col != j0[:, None])
    other_ring = (jnp.abs(ring_diff) > 0.0) & (jnp.abs(ring_diff) <= nearby_scan)
    j2, d2 = masked_argmin(d, same_ring)
    j3, d3 = masked_argmin(d, other_ring)
    valid = (
        q_mask
        & (d0 < dist_sq_threshold)
        & (d2 < dist_sq_threshold)
        & (d3 < dist_sq_threshold)
    )
    return PlaneAssoc(j0, j2, j3, valid)


def ring_top2(
    q_xyz: jax.Array, c_blocks: jax.Array, m_blocks: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-(query, ring) two nearest candidates, streaming over ring blocks.

    ``c_blocks`` (R, B, 3) is the candidate cloud in its natural ring-major
    block layout (feature extraction emits fixed-size per-ring blocks), so
    "ring" is just the leading block index. The (Q, R, B) distance tensor is
    immediately reduced to per-ring top-2 — one write + one read of the tensor
    instead of the ~6 full-matrix passes of the masked-argmin formulation
    (ring-difference masks, three argmins, gathers).

    Returns (dist (Q, R, 2), idx (Q, R, 2)); idx is flat into (R·B).
    """
    R, B, _ = c_blocks.shape
    qq = jnp.sum(q_xyz * q_xyz, axis=-1)[:, None, None]          # (Q, 1, 1)
    cc = jnp.sum(c_blocks * c_blocks, axis=-1)[None]             # (1, R, B)
    qc = jax.lax.dot_general(
        q_xyz, c_blocks,
        dimension_numbers=(((1,), (2,)), ((), ())),              # (Q, R, B)
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(qq + cc - 2.0 * qc, 0.0)
    d = jnp.where(m_blocks[None], d, _BIG)
    # top-2 as two argmin reductions — lax.top_k lowers to a full sort on TPU
    # (measured 2.7× slower end-to-end); argmin is a plain fast reduce.
    i1 = jnp.argmin(d, axis=-1)                                  # (Q, R)
    d1 = jnp.take_along_axis(d, i1[..., None], axis=-1)[..., 0]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
    d_rest = jnp.where(col == i1[..., None], _BIG, d)
    i2 = jnp.argmin(d_rest, axis=-1)
    d2 = jnp.take_along_axis(d_rest, i2[..., None], axis=-1)[..., 0]
    base = (jnp.arange(R, dtype=jnp.int32) * B)[None, :, None]
    dist = jnp.stack([d1, d2], axis=-1)                          # (Q, R, 2)
    idx = jnp.stack([i1, i2], axis=-1) + base
    return dist, idx


def ring_top2_best(
    q_xyz: jax.Array, c_blocks: jax.Array, m_blocks: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Dispatch ring_top2 to the Pallas TPU kernel (ops/pallas_nn.py,
    ~200× faster than the XLA formulation) or fall back to XLA off-TPU.

    Handles lane-padding of B to a multiple of 128 for the kernel; padded
    entries sit at BAKE_FAR so they only surface for fully-masked rings, where
    the distance gate rejects them anyway.
    """
    if jax.default_backend() != "tpu":
        return ring_top2(q_xyz, c_blocks, m_blocks)

    from . import pallas_nn

    R, B, _ = c_blocks.shape
    baked = pallas_nn.bake_mask(c_blocks, m_blocks)
    B_pad = -(-B // 128) * 128
    if B_pad != B:
        baked = jnp.pad(
            baked, ((0, 0), (0, B_pad - B), (0, 0)),
            constant_values=pallas_nn.BAKE_FAR,
        )
    dist, idx = pallas_nn.ring_top2_pallas(q_xyz, baked)
    if B_pad != B:
        ring = idx // B_pad
        col = jnp.minimum(idx % B_pad, B - 1)
        idx = ring * B + col
    return dist, idx


def associate_edges_ringblocked(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_blocks: jax.Array,
    m_blocks: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> EdgeAssoc:
    """Corner association over ring-major candidate blocks (same semantics as
    ``associate_edges``, ~B× less memory traffic)."""
    dist, idx = ring_top2_best(q_xyz, c_blocks, m_blocks)  # (Q, R, 2)
    d1 = dist[:, :, 0]                                    # best per ring
    r0 = jnp.argmin(d1, axis=1)                           # (Q,)
    d0 = jnp.take_along_axis(d1, r0[:, None], axis=1)[:, 0]
    j0 = jnp.take_along_axis(idx[:, :, 0], r0[:, None], axis=1)[:, 0]

    R = c_blocks.shape[0]
    rings = jnp.arange(R, dtype=jnp.float32)[None, :]
    rd = jnp.abs(rings - r0[:, None].astype(jnp.float32))
    m2 = (rd > 0.0) & (rd <= nearby_scan)
    d1m = jnp.where(m2, d1, _BIG)
    r2 = jnp.argmin(d1m, axis=1)
    d2 = jnp.take_along_axis(d1m, r2[:, None], axis=1)[:, 0]
    j2 = jnp.take_along_axis(idx[:, :, 0], r2[:, None], axis=1)[:, 0]
    valid = q_mask & (d0 < dist_sq_threshold) & (d2 < dist_sq_threshold)
    return EdgeAssoc(j0, j2, valid)


def associate_planes_ringblocked(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_blocks: jax.Array,
    m_blocks: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> PlaneAssoc:
    """Surf association over ring-major blocks: j0 = global NN, j2 = ring-r0
    runner-up, j3 = best on a different ring within ±2.5."""
    dist, idx = ring_top2_best(q_xyz, c_blocks, m_blocks)
    d1 = dist[:, :, 0]
    r0 = jnp.argmin(d1, axis=1)
    d0 = jnp.take_along_axis(d1, r0[:, None], axis=1)[:, 0]
    j0 = jnp.take_along_axis(idx[:, :, 0], r0[:, None], axis=1)[:, 0]
    # same-ring second-nearest
    d2 = jnp.take_along_axis(dist[:, :, 1], r0[:, None], axis=1)[:, 0]
    j2 = jnp.take_along_axis(idx[:, :, 1], r0[:, None], axis=1)[:, 0]

    R = c_blocks.shape[0]
    rings = jnp.arange(R, dtype=jnp.float32)[None, :]
    rd = jnp.abs(rings - r0[:, None].astype(jnp.float32))
    m3 = (rd > 0.0) & (rd <= nearby_scan)
    d1m = jnp.where(m3, d1, _BIG)
    r3 = jnp.argmin(d1m, axis=1)
    d3 = jnp.take_along_axis(d1m, r3[:, None], axis=1)[:, 0]
    j3 = jnp.take_along_axis(idx[:, :, 0], r3[:, None], axis=1)[:, 0]
    valid = (
        q_mask
        & (d0 < dist_sq_threshold)
        & (d2 < dist_sq_threshold)
        & (d3 < dist_sq_threshold)
    )
    return PlaneAssoc(j0, j2, j3, valid)


class EdgeAssocCoords(NamedTuple):
    """Edge association resolved to coordinates (no index gathers needed)."""

    a: jax.Array      # (Q, 3) nearest neighbor
    b: jax.Array      # (Q, 3) nearest on a different ring within the window
    valid: jax.Array


class PlaneAssocCoords(NamedTuple):
    j: jax.Array      # nearest
    l: jax.Array      # same-ring runner-up
    m: jax.Array      # different-ring nearest within the window
    valid: jax.Array


def _baked_padded(c_blocks, m_blocks):
    from . import pallas_nn

    B = c_blocks.shape[1]
    baked = pallas_nn.bake_mask(c_blocks, m_blocks)
    B_pad = -(-B // 128) * 128
    if B_pad != B:
        baked = jnp.pad(
            baked, ((0, 0), (0, B_pad - B), (0, 0)),
            constant_values=pallas_nn.BAKE_FAR,
        )
    return baked


def _ring_top2_with_coords(q_xyz, c_blocks, m_blocks):
    """(dist (Q,R,2), c1 (Q,R,3), c2 (Q,R,3)): Pallas on TPU (coords gathered
    in-kernel via one-hot MXU dots), XLA + small gathers elsewhere."""
    if jax.default_backend() == "tpu":
        from . import pallas_nn

        return pallas_nn.ring_top2_coords(q_xyz, _baked_padded(c_blocks, m_blocks))

    dist, idx = ring_top2(q_xyz, c_blocks, m_blocks)
    flat = c_blocks.reshape(-1, 3)
    return dist, flat[idx[..., 0]], flat[idx[..., 1]]


def _take_ring(x, r):
    """x (Q, R, ...) indexed at per-query ring r (Q,) → (Q, ...)."""
    return jnp.take_along_axis(
        x, r[:, None, *([None] * (x.ndim - 2))], axis=1
    )[:, 0]


def associate_edges_coords(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_blocks: jax.Array,
    m_blocks: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> EdgeAssocCoords:
    """Corner association returning line endpoint coordinates directly."""
    if jax.default_backend() == "tpu":
        from . import pallas_nn

        out = pallas_nn.associate_kernel(
            q_xyz, _baked_padded(c_blocks, m_blocks), nearby_scan=nearby_scan
        )
        valid = (
            q_mask
            & (out[:, 9] < dist_sq_threshold)
            & (out[:, 11] < dist_sq_threshold)
        )
        return EdgeAssocCoords(out[:, 0:3], out[:, 6:9], valid)
    dist, c1, _ = _ring_top2_with_coords(q_xyz, c_blocks, m_blocks)
    d1 = dist[:, :, 0]
    r0 = jnp.argmin(d1, axis=1)
    d0 = _take_ring(d1, r0)
    a = _take_ring(c1, r0)

    R = c_blocks.shape[0]
    rings = jnp.arange(R, dtype=jnp.float32)[None, :]
    rd = jnp.abs(rings - r0[:, None].astype(jnp.float32))
    d1m = jnp.where((rd > 0.0) & (rd <= nearby_scan), d1, _BIG)
    r2 = jnp.argmin(d1m, axis=1)
    d2 = _take_ring(d1m, r2)
    b = _take_ring(c1, r2)
    valid = q_mask & (d0 < dist_sq_threshold) & (d2 < dist_sq_threshold)
    return EdgeAssocCoords(a, b, valid)


def associate_planes_coords(
    q_xyz: jax.Array,
    q_mask: jax.Array,
    c_blocks: jax.Array,
    m_blocks: jax.Array,
    *,
    dist_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> PlaneAssocCoords:
    """Surf association returning the three plane-point coordinates."""
    if jax.default_backend() == "tpu":
        from . import pallas_nn

        out = pallas_nn.associate_kernel(
            q_xyz, _baked_padded(c_blocks, m_blocks), nearby_scan=nearby_scan
        )
        valid = (
            q_mask
            & (out[:, 9] < dist_sq_threshold)
            & (out[:, 10] < dist_sq_threshold)
            & (out[:, 11] < dist_sq_threshold)
        )
        return PlaneAssocCoords(out[:, 0:3], out[:, 3:6], out[:, 6:9], valid)
    dist, c1, c2 = _ring_top2_with_coords(q_xyz, c_blocks, m_blocks)
    d1 = dist[:, :, 0]
    r0 = jnp.argmin(d1, axis=1)
    d0 = _take_ring(d1, r0)
    j = _take_ring(c1, r0)
    d2 = _take_ring(dist[:, :, 1], r0)
    l = _take_ring(c2, r0)

    R = c_blocks.shape[0]
    rings = jnp.arange(R, dtype=jnp.float32)[None, :]
    rd = jnp.abs(rings - r0[:, None].astype(jnp.float32))
    d1m = jnp.where((rd > 0.0) & (rd <= nearby_scan), d1, _BIG)
    r3 = jnp.argmin(d1m, axis=1)
    d3 = _take_ring(d1m, r3)
    m = _take_ring(c1, r3)
    valid = (
        q_mask
        & (d0 < dist_sq_threshold)
        & (d2 < dist_sq_threshold)
        & (d3 < dist_sq_threshold)
    )
    return PlaneAssocCoords(j, l, m, valid)


def knn(
    q_xyz: jax.Array,
    c_xyz: jax.Array,
    c_mask: jax.Array,
    k: int,
    *,
    chunk: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Generic k-NN: (Q, k) indices + squared distances, ascending.

    For large candidate sets pass ``chunk`` to stream the distance matrix in
    column blocks with a running top-k merge (bounds peak memory to
    Q×chunk instead of Q×C) — the scan-to-map path uses this.
    """
    if chunk is None or chunk >= c_xyz.shape[0]:
        d = pairwise_sqdist(q_xyz, c_xyz, c_mask)
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx, -neg_d

    C = c_xyz.shape[0]
    n_chunks = (C + chunk - 1) // chunk
    pad = n_chunks * chunk - C
    c_pad = jnp.pad(c_xyz, ((0, pad), (0, 0)))
    m_pad = jnp.pad(c_mask, (0, pad))
    c_blocks = c_pad.reshape(n_chunks, chunk, 3)
    m_blocks = m_pad.reshape(n_chunks, chunk)

    Q = q_xyz.shape[0]

    def step(carry, blk):
        best_d, best_i = carry
        c_blk, m_blk, base = blk
        d = pairwise_sqdist(q_xyz, c_blk, m_blk)          # (Q, chunk)
        cand_i = base + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(cand_i, (Q, chunk))], axis=1)
        neg_d, sel = jax.lax.top_k(-all_d, k)
        return (-neg_d, jnp.take_along_axis(all_i, sel, axis=1)), None

    init = (
        jnp.full((Q, k), _BIG),
        jnp.zeros((Q, k), dtype=jnp.int32),
    )
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(step, init, (c_blocks, m_blocks, bases))
    return best_i, best_d
