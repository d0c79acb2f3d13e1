"""Multi-chip data-parallel odometry over a `jax.sharding.Mesh`.

The reference has no distributed capability (SURVEY.md §2.4); this layer is
the framework's new scaling dimension. The scan-to-scan Gauss-Newton is
embarrassingly parallel over residual blocks: current-frame features shard
across the ``data`` mesh axis, each device associates and accumulates its
shard's 6×6 normal equations against the (replicated) previous-frame clouds,
and one ``lax.psum`` over ICI reduces H and g before the tiny replicated
solve. Per iteration the collective moves 42 floats — latency-bound, far under
the frame budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.lidar_odometry import scan_to_scan_impl
from ..ops import se3
from ..ops.features import FeatureCloud, ScanFeatures
from ..utils.config import OdometryConfig

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def _feature_specs():
    sharded = FeatureCloud(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    replicated = FeatureCloud(P(), P(), P(), P())
    return sharded, replicated


def sharded_scan_to_scan(
    mesh: Mesh,
    curr: ScanFeatures,
    prev_less_sharp: FeatureCloud,
    prev_less_flat: FeatureCloud,
    init_rel: se3.Pose,
    cfg: OdometryConfig,
) -> se3.Pose:
    """Full odometry step with current features sharded over the mesh.

    Current-frame query points split along their padded capacity axis (must be
    divisible by the mesh size); previous-frame candidate clouds and the pose
    replicate. The GN normal equations reduce with ``psum`` over ICI.
    """
    fc_shard, fc_rep = _feature_specs()
    curr_spec = ScanFeatures(fc_shard, fc_rep, fc_shard, fc_rep)
    pose_spec = se3.Pose(P(), P())

    def step(curr, prev_ls, prev_lf, init_rel):
        def psum_reduce(H, g):
            return (
                jax.lax.psum(H, DATA_AXIS),
                jax.lax.psum(g, DATA_AXIS),
            )

        return scan_to_scan_impl(
            curr, prev_ls, prev_lf, init_rel, cfg, reduce_fn=psum_reduce
        )

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(curr_spec, fc_rep, fc_rep, pose_spec),
        out_specs=pose_spec,
        check_vma=False,
    )
    return jax.jit(fn)(curr, prev_less_sharp, prev_less_flat, init_rel)
