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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAKE_FAR = 1e6  # masked candidates are moved here (distance² ≈ 1e12)
_BIG = jnp.float32(1e30)


def bake_mask(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """Move masked-out points to BAKE_FAR so they can never be nearest."""
    return jnp.where(mask[..., None], xyz, BAKE_FAR)


def _ring_top2_kernel(q_ref, c_ref, d_ref, i_ref):
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
    Q = q_xyz.shape[0]
    R, B, _ = c_blocks_baked.shape

    d_rings, i_rings = pl.pallas_call(
        _ring_top2_kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((Q, 3), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 3), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q, 2), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, 2), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, Q, 2), jnp.float32),
            jax.ShapeDtypeStruct((R, Q, 2), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, c_blocks_baked)

    base = (jnp.arange(R, dtype=jnp.int32) * B)[:, None, None]
    return d_rings.transpose(1, 0, 2), (i_rings + base).transpose(1, 0, 2)
