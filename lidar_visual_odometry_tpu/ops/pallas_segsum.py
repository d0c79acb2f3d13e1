"""Pallas TPU kernel: batched segment-sum via one-hot MXU contraction.

The per-ring voxel filter (ops/pointcloud.voxel_downsample, ≡ pcl::VoxelGrid,
``scanRegistration.cpp:401-407``) reduces sorted runs of equal voxel id to
their coordinate sums. The XLA scatter-add formulation serializes on TPU
(~2.4 ms/frame for the 64-ring less-flat filter); here each ring's segment
sum is one (C, W)·(W, S) one-hot contraction on the MXU — the standard
TPU segment-sum trick — at HIGHEST precision (voxel centroids feed geometry).

Layouts are native throughout: values arrive planar (R, C, W) (channels on
sublanes, points on lanes), the one-hot is built as (S, W) (segments on
sublanes, points on lanes) from the (1, W) segment-id lane row, and the dot
contracts the shared lane axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segsum_kernel(q_ref, v_ref, out_ref):
    seg = q_ref[0]                       # (1, W) int32 segment ids
    vals = v_ref[0]                      # (C, W)
    S = out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, seg.shape[1]), 0)
    oh = (rows == seg).astype(jnp.float32)          # (S, W)
    out_ref[0] = jax.lax.dot_general(
        vals, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("n_segments", "interpret"))
def segment_sum_batched(
    seg_id: jax.Array,    # (R, W) int32 in [0, n_segments)
    vals: jax.Array,      # (R, C, W) float32
    *,
    n_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-batch-row segment sums: out[r, c, s] = Σ_{w: seg_id[r,w]=s} vals[r,c,w].

    n_segments is padded to a lane multiple internally; ids ≥ n_segments must
    not occur (clamp in the caller — the voxel filter's overflow bucket is a
    valid segment).
    """
    R, W = seg_id.shape
    C = vals.shape[1]
    S_pad = -(-n_segments // 128) * 128
    out = pl.pallas_call(
        _segsum_kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, W), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, S_pad), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C, S_pad), jnp.float32),
        interpret=interpret,
    )(seg_id[:, None, :], vals)
    return out[:, :, :n_segments]


def segment_sum(
    seg_id: jax.Array,    # (W,) int32 in [0, n_segments)
    vals: jax.Array,      # (C, W) float32
    *,
    n_segments: int,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flat segment sum out[c, s] = Σ_{w: seg_id[w]=s} vals[c, w] as chunked
    one-hot MXU contractions: the point axis splits into W/chunk rows so each
    row's (S, chunk) one-hot fits VMEM, partial sums reduce over rows.

    The XLA scatter-add alternative serializes on TPU (~5-10 ms for a 32k
    voxel filter); this is sub-ms MXU work (2·W·S·C flops streamed)."""
    C, W = vals.shape
    # the per-row (S_pad, chunk) one-hot must fit VMEM (~16 MB total budget);
    # shrink the point chunk for large segment counts (e.g. the host
    # cube-map path's 8192-voxel filter: S_pad=8320 → chunk 256 ≈ 8.5 MB)
    S_pad = -(-n_segments // 128) * 128
    chunk = min(chunk, max(128, (10 * 2**20 // (4 * S_pad)) // 128 * 128))
    pad = (-W) % chunk
    if pad:
        seg_id = jnp.concatenate(
            [seg_id, jnp.full((pad,), n_segments - 1, seg_id.dtype)]
        )
        vals = jnp.concatenate([vals, jnp.zeros((C, pad), vals.dtype)], axis=1)
        W += pad
    R = W // chunk
    partials = segment_sum_batched(
        seg_id.reshape(R, chunk),
        vals.reshape(C, R, chunk).transpose(1, 0, 2),
        n_segments=n_segments,
        interpret=interpret,
    )                                 # (R, C, S)
    return partials.sum(axis=0)
