"""Pallas TPU kernel: fused nearest-neighbor search over ring blocks.

The XLA formulation of ring-blocked association (ops/knn.py `ring_top2`)
materializes the (Q, R, B) distance tensor in HBM and re-reads it for each
reduction — measured ~5.6 ms for the surf query (1536×64×512) on TPU v5e,
~10× above the bandwidth bound. This kernel fuses distance computation and
the per-ring top-2 reduction in VMEM: HBM traffic is just the (Q, 3) queries,
(R, B, 3) candidates, and the (Q, R, 2) results (~1 MB total vs ~800 MB).

Grid = (R,): each step loads one ring's candidate block into VMEM, computes
the (Q, B) squared distances with three VPU FMA sweeps (K=3 is hostile to the
MXU — 3/128 utilization — so the VPU broadcast form wins), and reduces to the
two nearest candidates per query with two masked argmin passes.

Masking contract: invalid candidates must be pre-baked to a far coordinate
(``BAKE_FAR``) by the caller — distance ≈ 1e12 excludes them from any gated
selection without a mask operand.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAKE_FAR = 1e6  # masked candidates are moved here (distance² ≈ 1e12)
_BIG = np.float32(1e30)  # np scalar: no eager backend init at import
_IMAX = np.int32(2**31 - 1)


def bake_mask(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """Move masked-out points to BAKE_FAR so they can never be nearest."""
    return jnp.where(mask[..., None], xyz, BAKE_FAR)


def _ring_top2_kernel(q_ref, c_ref, d_ref, i_ref, c12_ref):
    q = q_ref[:]                     # (Q, 3)
    c = c_ref[0]                     # (B, 3)
    Q = q.shape[0]
    B = c.shape[0]

    # (Q, B) squared distances via three broadcast FMA sweeps on the VPU.
    dx = q[:, 0:1] - c[:, 0][None, :]
    dy = q[:, 1:2] - c[:, 1][None, :]
    dz = q[:, 2:3] - c[:, 2][None, :]
    d = dx * dx + dy * dy + dz * dz

    col = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 1)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.min(d, axis=1)
    d_rest = jnp.where(col == i1[:, None], 1e30, d)
    i2 = jnp.argmin(d_rest, axis=1)
    d2 = jnp.min(d_rest, axis=1)

    d_ref[0] = jnp.stack([d1, d2], axis=-1)
    i_ref[0] = jnp.stack([i1, i2], axis=-1)

    # Gather the two winners' coordinates via one-hot MXU matmuls — XLA-side
    # gathers of correspondence points measure ~1.3 ms on these shapes; here
    # they are two (Q, B)×(B, 3) dots over data already in VMEM.
    oh1 = (col == i1[:, None]).astype(jnp.float32)
    oh2 = (col == i2[:, None]).astype(jnp.float32)
    # HIGHEST: default MXU precision truncates coords to bf16 (~4e-3 relative
    # → centimeters at lidar ranges; measured +27% ATE end-to-end)
    c1 = jax.lax.dot_general(
        oh1, c, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    c2 = jax.lax.dot_general(
        oh2, c, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    zeros = jnp.zeros((Q, 1), jnp.float32)
    c12_ref[0] = jnp.concatenate([c1, c2, zeros, zeros], axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def ring_top2_pallas(
    q_xyz: jax.Array, c_blocks_baked: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Per-(query, ring) two nearest candidates.

    q_xyz: (Q, 3); c_blocks_baked: (R, B, 3) with masked points at BAKE_FAR
    (see ``bake_mask``). B should be lane-aligned (multiple of 128); pad with
    BAKE_FAR points otherwise. Returns (dist (Q, R, 2), idx (Q, R, 2)),
    idx flat into (R·B) — drop-in replacement for ``knn.ring_top2``.
    """
    d_rings, i_rings, _ = _ring_top2_call(q_xyz, c_blocks_baked, interpret)
    R, B, _ = c_blocks_baked.shape
    base = (jnp.arange(R, dtype=jnp.int32) * B)[:, None, None]
    return d_rings.transpose(1, 0, 2), (i_rings + base).transpose(1, 0, 2)


def _ring_top2_call(q_xyz, c_blocks_baked, interpret):
    Q = q_xyz.shape[0]
    R, B, _ = c_blocks_baked.shape
    # Tile queries: the full-Q kernel VMEM-OOMs at Q≈1536 (the (Q, B)
    # distance matrix + two one-hot operands at HIGHEST precision exceed the
    # 16 MB scoped limit). 256-query tiles keep every buffer ≲1 MB.
    QT = Q
    for cand in (256, 128, 64, 32, 16, 8):
        if Q % cand == 0:
            QT = cand
            break
    return pl.pallas_call(
        _ring_top2_kernel,
        grid=(Q // QT, R),
        in_specs=[
            pl.BlockSpec((QT, 3), lambda qi, r: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 3), lambda qi, r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QT, 2), lambda qi, r: (r, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, 2), lambda qi, r: (r, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, 8), lambda qi, r: (r, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, Q, 2), jnp.float32),
            jax.ShapeDtypeStruct((R, Q, 2), jnp.int32),
            jax.ShapeDtypeStruct((R, Q, 8), jnp.float32),
        ],
        interpret=interpret,
    )(q_xyz, c_blocks_baked)


def _assoc_kernel(nearby_scan, q_ref, c_ref, out_ref,
                  d1s, d2s, c1xs, c1ys, c1zs, c2xs, c2ys, c2zs):
    """Full ring-structured association for one query tile.

    Loops rings in-kernel (per-ring top-2 + coordinates into VMEM scratch),
    then resolves the cross-ring selection: nearest overall (ring r0), its
    same-ring runner-up, and the nearest within ±nearby_scan rings of r0 —
    everything the edge and plane associators need, in one launch.

    Every operand is layout-native (this kernel's first version spent ~90% of
    its time in Mosaic sublane↔lane transposes): queries arrive planar
    (3, QT) so components are lane-rows; distances live as (B, QT) with
    candidates on the *sublane* axis, so per-ring reductions produce lane-rows
    that store straight into the (R, QT) scratch rows; the cross-ring phase
    reduces over R sublanes; the output is planar (16, QT) row writes.

    out rows: [0:3 c1r0 | 3:6 c2r0 | 6:9 c1rw | 9 d0 | 10 d2same | 11 dw | pad].
    """
    qx = q_ref[0:1, :]                   # (1, QT)
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    QT = q_ref.shape[1]
    R = c_ref.shape[0]
    B = c_ref.shape[1]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (B, QT), 0)

    def per_ring(r, _):
        c = c_ref[pl.ds(r, 1)][0]        # (B, 3)
        cx = c[:, 0:1]                   # (B, 1)
        cy = c[:, 1:2]
        cz = c[:, 2:3]
        dx = cx - qx                     # (B, QT)
        dy = cy - qy
        dz = cz - qz
        d = dx * dx + dy * dy + dz * dz
        i1 = jnp.argmin(d, axis=0)       # (QT,) lane-rows
        d1 = jnp.min(d, axis=0)
        hit1 = rows_b == i1[None, :]
        oh1 = hit1.astype(jnp.float32)
        d_rest = jnp.where(hit1, 1e30, d)
        i2 = jnp.argmin(d_rest, axis=0)
        d2 = jnp.min(d_rest, axis=0)
        oh2 = (rows_b == i2[None, :]).astype(jnp.float32)

        d1s[pl.ds(r, 1), :] = d1[None, :]
        d2s[pl.ds(r, 1), :] = d2[None, :]
        c1xs[pl.ds(r, 1), :] = jnp.sum(oh1 * cx, axis=0)[None, :]
        c1ys[pl.ds(r, 1), :] = jnp.sum(oh1 * cy, axis=0)[None, :]
        c1zs[pl.ds(r, 1), :] = jnp.sum(oh1 * cz, axis=0)[None, :]
        c2xs[pl.ds(r, 1), :] = jnp.sum(oh2 * cx, axis=0)[None, :]
        c2ys[pl.ds(r, 1), :] = jnp.sum(oh2 * cy, axis=0)[None, :]
        c2zs[pl.ds(r, 1), :] = jnp.sum(oh2 * cz, axis=0)[None, :]
        return 0

    jax.lax.fori_loop(0, R, per_ring, 0)

    # cross-ring selection in (R, QT) layout: reductions over the sublane axis
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, QT), 0)
    d1_all = d1s[:]
    r0 = jnp.argmin(d1_all, axis=0)                         # (QT,)
    d0 = jnp.min(d1_all, axis=0)
    oh0 = (rows == r0[None, :]).astype(jnp.float32)
    d2same = jnp.sum(oh0 * d2s[:], axis=0)

    rdiff = jnp.abs(rows.astype(jnp.float32) - r0[None, :].astype(jnp.float32))
    win = (rdiff > 0.0) & (rdiff <= nearby_scan)
    d1w = jnp.where(win, d1_all, 1e30)
    rw = jnp.argmin(d1w, axis=0)
    dw = jnp.min(d1w, axis=0)
    ohw = (rows == rw[None, :]).astype(jnp.float32) * win.astype(jnp.float32)

    out_ref[0:1, :] = jnp.sum(oh0 * c1xs[:], axis=0)[None, :]
    out_ref[1:2, :] = jnp.sum(oh0 * c1ys[:], axis=0)[None, :]
    out_ref[2:3, :] = jnp.sum(oh0 * c1zs[:], axis=0)[None, :]
    out_ref[3:4, :] = jnp.sum(oh0 * c2xs[:], axis=0)[None, :]
    out_ref[4:5, :] = jnp.sum(oh0 * c2ys[:], axis=0)[None, :]
    out_ref[5:6, :] = jnp.sum(oh0 * c2zs[:], axis=0)[None, :]
    out_ref[6:7, :] = jnp.sum(ohw * c1xs[:], axis=0)[None, :]
    out_ref[7:8, :] = jnp.sum(ohw * c1ys[:], axis=0)[None, :]
    out_ref[8:9, :] = jnp.sum(ohw * c1zs[:], axis=0)[None, :]
    out_ref[9:10, :] = d0[None, :]
    out_ref[10:11, :] = d2same[None, :]
    out_ref[11:12, :] = dw[None, :]
    out_ref[12:16, :] = jnp.zeros((4, QT), jnp.float32)


@partial(jax.jit, static_argnames=("nearby_scan", "q_tile", "interpret"))
def associate_kernel(
    q_xyz: jax.Array,
    c_blocks_baked: jax.Array,
    *,
    nearby_scan: float = 2.5,
    q_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One-launch association: returns (Q, 16) rows
    [a/j (3) | l (3) | b/m (3) | d0 | d2same | dw | pad] — see _assoc_kernel.
    """
    Q = q_xyz.shape[0]
    R, B, _ = c_blocks_baked.shape
    qt = q_tile
    while Q % qt:
        qt //= 2
    out = pl.pallas_call(
        partial(_assoc_kernel, nearby_scan),
        grid=(Q // qt,),
        in_specs=[
            pl.BlockSpec((3, qt), lambda qi: (0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B, 3), lambda qi: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, qt), lambda qi: (0, qi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, Q), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, qt), jnp.float32)] * 8,
        interpret=interpret,
    )(q_xyz.T, c_blocks_baked)
    return out.T


def _block_topk_kernel(k, n_cchunks, q_ref, c_ref, d_out, c_out,
                       ds_ref, xs_ref, ys_ref, zs_ref):
    ct = pl.program_id(1)
    q = q_ref[:]                      # (QT, 3)
    c = c_ref[:]                      # (CT, 3)
    QT = q.shape[0]
    CT = c.shape[0]

    @pl.when(ct == 0)
    def _():
        ds_ref[:] = jnp.full((QT, k), 1e30, jnp.float32)
        xs_ref[:] = jnp.zeros((QT, k), jnp.float32)
        ys_ref[:] = jnp.zeros((QT, k), jnp.float32)
        zs_ref[:] = jnp.zeros((QT, k), jnp.float32)

    dx = q[:, 0:1] - c[:, 0][None, :]
    dy = q[:, 1:2] - c[:, 1][None, :]
    dz = q[:, 2:3] - c[:, 2][None, :]
    d = dx * dx + dy * dy + dz * dz   # (QT, CT)

    # local top-k of this chunk via k masked argmin sweeps, coords by
    # one-hot reductions (no gathers)
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, CT), 1)
    loc_d, loc_x, loc_y, loc_z = [], [], [], []
    cx = c[:, 0][None, :]
    cy = c[:, 1][None, :]
    cz = c[:, 2][None, :]
    dm = d
    for _ in range(k):
        i = jnp.argmin(dm, axis=1)
        oh = (col == i[:, None]).astype(jnp.float32)
        loc_d.append(jnp.sum(oh * dm, axis=1))
        loc_x.append(jnp.sum(oh * cx, axis=1))
        loc_y.append(jnp.sum(oh * cy, axis=1))
        loc_z.append(jnp.sum(oh * cz, axis=1))
        dm = jnp.where(col == i[:, None], 1e30, dm)

    # merge with the running best: (QT, 2k) → k argmin sweeps
    md = jnp.concatenate([ds_ref[:], jnp.stack(loc_d, axis=1)], axis=1)
    mx = jnp.concatenate([xs_ref[:], jnp.stack(loc_x, axis=1)], axis=1)
    my = jnp.concatenate([ys_ref[:], jnp.stack(loc_y, axis=1)], axis=1)
    mz = jnp.concatenate([zs_ref[:], jnp.stack(loc_z, axis=1)], axis=1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (QT, 2 * k), 1)
    nd, nx, ny, nz = [], [], [], []
    for _ in range(k):
        i = jnp.argmin(md, axis=1)
        oh = (col2 == i[:, None]).astype(jnp.float32)
        nd.append(jnp.sum(oh * jnp.where(md > 1e29, 0.0, md), axis=1)
                  + jnp.where(jnp.min(md, axis=1) > 1e29, 1e30, 0.0))
        nx.append(jnp.sum(oh * mx, axis=1))
        ny.append(jnp.sum(oh * my, axis=1))
        nz.append(jnp.sum(oh * mz, axis=1))
        md = jnp.where(col2 == i[:, None], 1e30, md)
    ds_ref[:] = jnp.stack(nd, axis=1)
    xs_ref[:] = jnp.stack(nx, axis=1)
    ys_ref[:] = jnp.stack(ny, axis=1)
    zs_ref[:] = jnp.stack(nz, axis=1)

    @pl.when(ct == n_cchunks - 1)
    def _():
        d_out[:] = ds_ref[:]
        c_out[:, :, 0] = xs_ref[:]
        c_out[:, :, 1] = ys_ref[:]
        c_out[:, :, 2] = zs_ref[:]


def _block_topk_packed_kernel(k, c_chunk, n_chunks, q_ref, ct_ref,
                              d_out, i_out):
    """Packed-scalar streaming top-k: distance and candidate index share one
    int32 whose ORDER equals the distance order.

    Positive IEEE-754 floats compare identically as signed ints, so
    ``(bitcast(d²) & ~0x7FFF) | index`` is monotonic in d² (the low 15
    mantissa bits — a ≤ 2⁻⁸ relative distance perturbation, far inside the
    1 m association gates — are repurposed for the candidate id, C ≤ 32768).
    Each of the k extraction rounds is then ONE int-min lane reduce plus one
    equality mask — no argmin select trees, no separate index bookkeeping.
    ~2× the plain formulation (_block_topk_loop_kernel) at the mapping
    association sizes; exactness is unchanged except for index-bit ties.
    """
    q = q_ref[:]                        # (QT, 3)
    QT = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, c_chunk), 1)
    imax = jnp.int32(2**31 - 1)
    low = jnp.int32(0x7FFF)

    def chunk_step(ci, rs):
        base = ci * c_chunk
        c = ct_ref[:, pl.dslice(base, c_chunk)]    # (3, c_chunk) lane-major
        dx = qx - c[0:1, :]
        dy = qy - c[1:2, :]
        dz = qz - c[2:3, :]
        dm = dx * dx + dy * dy + dz * dz           # (QT, c_chunk) f32 ≥ 0
        di = (
            jax.lax.bitcast_convert_type(dm, jnp.int32) & ~low
        ) | (base + col)

        # extract this chunk's k smallest packed values
        loc = []
        for _ in range(k):
            m = jnp.min(di, axis=1)                # (QT,)
            loc.append(m)
            di = jnp.where(di == m[:, None], imax, di)

        # merge with the running top-k (tiny (QT, 2k) panel)
        md = jnp.concatenate([rs, jnp.stack(loc, axis=1)], axis=1)
        ns = []
        for _ in range(k):
            m = jnp.min(md, axis=1)
            ns.append(m)
            md = jnp.where(md == m[:, None], imax, md)
        return jnp.stack(ns, axis=1)

    # unfilled slots carry a packed 1e30 (not INT_MAX, whose distance bits
    # would bitcast to NaN) — consumers gate on the distance
    sentinel = jnp.int32(
        (np.float32(1e30).view(np.int32) & ~0x7FFF) | 0x7FFF
    )
    rs0 = jnp.full((QT, k), sentinel, jnp.int32)
    rs = jax.lax.fori_loop(0, n_chunks, chunk_step, rs0)
    d_out[:] = jax.lax.bitcast_convert_type(rs & ~low, jnp.float32)
    i_out[:] = rs & low


def _block_topk_loop_kernel(k, c_chunk, n_chunks, q_ref, ct_ref, d_out, i_out):
    """One grid step per query tile; candidates stream through an internal
    ``fori_loop``. The two-axis (q_tile, c_chunk) grid formulation spent
    ~80% of its time in per-step overhead (256 dispatches of ~60 µs for a
    ~2 ms compute); here the whole candidate set sits in VMEM (C·3 floats,
    transposed to (3, C) so per-chunk column loads are lane-major — no
    sublane↔lane transposes) and the loop is free."""
    q = q_ref[:]                        # (QT, 3)
    QT = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, c_chunk), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (QT, 2 * k), 1)

    def chunk_step(ci, carry):
        ds, ii = carry                  # (QT, k) running best
        base = ci * c_chunk
        c = ct_ref[:, pl.dslice(base, c_chunk)]   # (3, c_chunk), lane-major
        dx = qx - c[0:1, :]
        dy = qy - c[1:2, :]
        dz = qz - c[2:3, :]
        dm = dx * dx + dy * dy + dz * dz          # (QT, c_chunk)

        loc_d, loc_i = [], []
        for _ in range(k):
            i = jnp.argmin(dm, axis=1)
            loc_d.append(jnp.min(dm, axis=1))
            loc_i.append(base + i)
            dm = jnp.where(col == i[:, None], 1e30, dm)

        md = jnp.concatenate([ds, jnp.stack(loc_d, axis=1)], axis=1)
        mi = jnp.concatenate([ii, jnp.stack(loc_i, axis=1)], axis=1)
        nd, ni = [], []
        for _ in range(k):
            j = jnp.argmin(md, axis=1)
            nd.append(jnp.min(md, axis=1))
            oh = col2 == j[:, None]
            ni.append(jnp.sum(jnp.where(oh, mi, 0), axis=1))
            md = jnp.where(oh, 1e30, md)
        return jnp.stack(nd, axis=1), jnp.stack(ni, axis=1)

    ds0 = jnp.full((QT, k), 1e30, jnp.float32)
    ii0 = jnp.zeros((QT, k), jnp.int32)
    ds, ii = jax.lax.fori_loop(0, n_chunks, chunk_step, (ds0, ii0))
    d_out[:] = ds
    i_out[:] = ii


def _block_topk_windowed_kernel(k, c_chunk, n_chunks, reach,
                                q_ref, qlo_ref, qhi_ref, clo_ref, chi_ref,
                                ct_ref, d_out, i_out):
    """Cell-windowed streaming top-k: candidate chunks whose coarse-cell key
    range cannot contain a neighbor cell of this query tile are skipped.

    Both sides are sorted by a raster key ``kx*W + ky`` of a 2D cell grid
    (cell ≥ the association gates, so the 3×3 cell neighborhood provably
    contains every gated neighbor — any cell adjacent to cell ``c`` has key
    within ``c ± (W+1)``). qlo/qhi are per-query-tile key ranges, clo/chi
    per-candidate-chunk ranges (SMEM scalars); the chunk loop body runs under
    ``lax.cond`` on range overlap. Skipped chunks leave the running top-k
    untouched — exactness is preserved for every consumer that gates at
    ≤ cell distance, and a worst-case (single dense row) degrades to the
    dense kernel, never to wrong answers.
    """
    qi = pl.program_id(0)
    lo = qlo_ref[qi] - reach
    hi = qhi_ref[qi] + reach
    q = q_ref[:]                        # (QT, 3)
    QT = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, c_chunk), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (QT, 2 * k), 1)

    def chunk_body(ci, carry):
        ds, ii = carry
        base = ci * c_chunk
        c = ct_ref[:, pl.dslice(base, c_chunk)]   # (3, c_chunk), lane-major
        dx = qx - c[0:1, :]
        dy = qy - c[1:2, :]
        dz = qz - c[2:3, :]
        dm = dx * dx + dy * dy + dz * dz          # (QT, c_chunk)

        loc_d, loc_i = [], []
        for _ in range(k):
            i = jnp.argmin(dm, axis=1)
            loc_d.append(jnp.min(dm, axis=1))
            loc_i.append(base + i)
            dm = jnp.where(col == i[:, None], 1e30, dm)

        md = jnp.concatenate([ds, jnp.stack(loc_d, axis=1)], axis=1)
        mi = jnp.concatenate([ii, jnp.stack(loc_i, axis=1)], axis=1)
        nd, ni = [], []
        for _ in range(k):
            j = jnp.argmin(md, axis=1)
            nd.append(jnp.min(md, axis=1))
            oh = col2 == j[:, None]
            ni.append(jnp.sum(jnp.where(oh, mi, 0), axis=1))
            md = jnp.where(oh, 1e30, md)
        return jnp.stack(nd, axis=1), jnp.stack(ni, axis=1)

    def chunk_step(ci, carry):
        hit = (clo_ref[ci] <= hi) & (chi_ref[ci] >= lo)
        return jax.lax.cond(hit, chunk_body, lambda _, c: c, ci, carry)

    ds0 = jnp.full((QT, k), 1e30, jnp.float32)
    ii0 = jnp.zeros((QT, k), jnp.int32)
    ds, ii = jax.lax.fori_loop(0, n_chunks, chunk_step, (ds0, ii0))
    d_out[:] = ds
    i_out[:] = ii


@partial(jax.jit, static_argnames=("k", "q_tile", "c_tile", "grid_w",
                                   "interpret"))
def block_topk_windowed(
    q_xyz: jax.Array,      # (Q, 3) — SORTED by cell key (efficiency only)
    q_keys: jax.Array,     # (Q,) int32 raster cell keys of q_xyz
    c_sorted: jax.Array,   # (C, 3) baked candidates SORTED by cell key
    c_keys: jax.Array,     # (C,) int32 keys of c_sorted (invalid = huge)
    *,
    k: int = 5,
    q_tile: int = 256,
    c_tile: int = 512,
    grid_w: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Cell-pruned k-NN: (dist (Q, k), index (Q, k)) into ``c_sorted``.

    Exact within one cell radius: any candidate within ``cell`` (the key
    grid's cell size) of a query is guaranteed considered; farther ones may
    be replaced by the 1e30 sentinel. Callers must gate at ≤ cell distance
    (the scan-to-map 1 m gates with 2 m cells, ``laserMapping.cpp:584,653``).
    Skipping is driven by key-range overlap per (query tile × candidate
    chunk); use ``cell_keys``/``sort_by_cell`` to build the inputs.
    """
    Q = q_xyz.shape[0]
    C = c_sorted.shape[0]
    assert Q % q_tile == 0 and C % c_tile == 0
    n_tiles = Q // q_tile
    n_c = C // c_tile
    qlo = jnp.min(q_keys.reshape(n_tiles, q_tile), axis=1)
    qhi = jnp.max(q_keys.reshape(n_tiles, q_tile), axis=1)
    clo = jnp.min(c_keys.reshape(n_c, c_tile), axis=1)
    chi = jnp.max(c_keys.reshape(n_c, c_tile), axis=1)

    d, idx = pl.pallas_call(
        partial(_block_topk_windowed_kernel, k, c_tile, n_c, grid_w + 1),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles,), lambda qi: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_tiles,), lambda qi: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_c,), lambda qi: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_c,), lambda qi: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, C), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, qlo, qhi, clo, chi, c_sorted.T)
    return d, idx


def cell_keys(
    xyz: jax.Array, origin: jax.Array, *, cell: float, grid_w: int
) -> jax.Array:
    """Raster key ``kx*W + ky`` of the 2D coarse cell grid anchored at
    ``origin`` (xy, (2,)). Out-of-coverage points clamp to edge cells —
    consistent on both sides, so windowing stays conservative."""
    kx = jnp.clip(
        jnp.floor((xyz[:, 0] - origin[0]) * (1.0 / cell)).astype(jnp.int32),
        0, grid_w - 1,
    )
    ky = jnp.clip(
        jnp.floor((xyz[:, 1] - origin[1]) * (1.0 / cell)).astype(jnp.int32),
        0, grid_w - 1,
    )
    return kx * grid_w + ky


def sort_by_cell(
    xyz: jax.Array, mask: jax.Array, origin: jax.Array,
    *, cell: float, grid_w: int,
) -> tuple[jax.Array, jax.Array]:
    """Bake + sort a candidate cloud by cell key for ``block_topk_windowed``.

    Returns (sorted baked xyz (C, 3), sorted keys (C,)); invalid points get
    key INT32_MAX (sort last, never overlap a query window) and BAKE_FAR
    coordinates (distance sentinel if a boundary chunk touches them).
    """
    baked = bake_mask(xyz, mask)
    keys = jnp.where(
        mask, cell_keys(baked, origin, cell=cell, grid_w=grid_w), _IMAX
    )
    ks, xs, ys, zs = jax.lax.sort(
        (keys, baked[:, 0], baked[:, 1], baked[:, 2]), num_keys=1
    )
    return jnp.stack([xs, ys, zs], axis=-1), ks


@partial(jax.jit, static_argnames=("k", "q_tile", "c_tile", "interpret",
                                   "packed"))
def block_topk(
    q_xyz: jax.Array,
    c_baked: jax.Array,
    *,
    k: int = 5,
    q_tile: int = 1024,
    c_tile: int = 512,
    interpret: bool = False,
    packed: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """k nearest candidates per query as (dist (Q, k), index (Q, k)).
    Same contract as :func:`block_topk_coords` but index-carrying and
    single-dispatch-per-query-tile — the fast path for the scan-to-map
    association (laserMapping.cpp:582,648).

    packed=True switches to the packed (distance|index) int32 kernel
    (distances quantized to 2⁻⁸ relative, requires C ≤ 32768). Measured on
    v5e at 4096×32768×k5 it is ~25% SLOWER than the default (15.9 vs
    12.7 ms) — Mosaic's fused argmin reduce beats the int-min + equality
    mask pair — so it stays opt-in as a documented experiment."""
    Q = q_xyz.shape[0]
    C = c_baked.shape[0]
    assert Q % q_tile == 0 and C % c_tile == 0
    n_c = C // c_tile
    if packed and C > 32768:
        packed = False          # index must fit the 15 repurposed bits
    kern = _block_topk_packed_kernel if packed else _block_topk_loop_kernel

    d, idx = pl.pallas_call(
        partial(kern, k, c_tile, n_c),
        grid=(Q // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda qi: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, c_baked.T)
    return d, idx


@partial(jax.jit, static_argnames=("k", "q_tile", "c_tile", "interpret"))
def block_topk_coords(
    q_xyz: jax.Array,
    c_baked: jax.Array,
    *,
    k: int = 5,
    q_tile: int = 1024,
    c_tile: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """k nearest candidates per query with coordinates, streaming over
    candidate chunks in VMEM (the scan-to-map kd-tree replacement;
    laserMapping.cpp:582,648 5-NN queries).

    q_xyz (Q, 3) with Q % q_tile == 0; c_baked (C, 3) with masked points at
    BAKE_FAR and C % c_tile == 0. Returns (dist (Q, k), coords (Q, k, 3));
    unfilled slots have dist ≥ 1e30.
    """
    Q = q_xyz.shape[0]
    C = c_baked.shape[0]
    assert Q % q_tile == 0 and C % c_tile == 0
    n_c = C // c_tile

    d, coords = pl.pallas_call(
        partial(_block_topk_kernel, k, n_c),
        grid=(Q // q_tile, n_c),
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, 3), lambda qi, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k, 3), lambda qi, ci: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k, 3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.float32),
        ],
        interpret=interpret,
    )(q_xyz, c_baked)
    return d, coords


@partial(jax.jit, static_argnames=("interpret",))
def ring_top2_coords(
    q_xyz: jax.Array, c_blocks_baked: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-(query, ring) top-2 with gathered coordinates.

    Returns (dist (Q, R, 2), c1 (Q, R, 3), c2 (Q, R, 3)) — the nearest and
    runner-up candidate coordinates per ring, so downstream association needs
    no index gathers into the big candidate cloud at all.
    """
    d_rings, _, c12 = _ring_top2_call(q_xyz, c_blocks_baked, interpret)
    c12 = c12.transpose(1, 0, 2)
    return d_rings.transpose(1, 0, 2), c12[..., 0:3], c12[..., 3:6]
