"""Multi-chip data-parallel visual frontend over a `jax.sharding.Mesh`.

Completes the distributed layer's coverage of the visual half (the lidar
stages and the photometric window BA already shard —
``sharded_odometry.py`` / ``sharded_ba.py``): the feature-VO frame step
(≡ ``Frontend::trackfeature``, ``Frontend.cpp:188-515``) is feature-parallel
end to end —

* KLT tracking: each device tracks its slice of the feature table against
  the (replicated) image pyramids — zero communication,
* depth association + triangulation: per-shard queries against the
  replicated 10-plane depth cloud — zero communication,
* pose GN: per-shard epipolar/reprojection rows accumulate partial
  (6×6, 6) normal equations plus the staged-gate counters; ONE ``psum``
  per iteration reduces them (≈176 B over ICI — the same latency-bound
  pattern as ``sharded_odometry``).

Replenishment (per-cell top-k over the dense score map) is image-global and
stays replicated/host-side, exactly like map insertion does for the sharded
mapping stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import visual_frontend as vf
from ..ops import camera as cam_ops
from ..ops import lk, se3
from ..utils.config import VisualConfig
from .sharded_odometry import DATA_AXIS, make_mesh  # noqa: F401  (re-export)


def _table_spec(spec) -> vf.FeatureTable:
    return vf.FeatureTable(*([spec] * len(vf.FeatureTable._fields)))


def sharded_visual_step(
    mesh: Mesh,
    prev_pyr: tuple,
    cur_pyr: tuple,
    prev_dc: vf.DepthCloud,
    table: vf.FeatureTable,
    pose_w: se3.Pose,
    warm_rel: se3.Pose,
    cam,
    cfg: VisualConfig,
) -> tuple[jax.Array, jax.Array, se3.Pose, se3.Pose]:
    """One feature-VO frame (track → associate → pose GN), feature-parallel.

    The feature table shards along its capacity axis (must divide the mesh
    size); pyramids, depth cloud, and poses replicate. Returns
    (uv1, ok, T_cur_prev, new pose_w) — identical to the unsharded
    track + ``solve_and_update`` composition (parity-tested on the
    8-device mesh); feed them to the replicated table update/replenish.
    """
    pyr_spec = tuple(P() for _ in prev_pyr)
    dc_spec = vf.DepthCloud(P(), P(), P())
    pose_spec = se3.Pose(P(), P())
    t_shard = _table_spec(P(DATA_AXIS))

    def step(prev_pyr, cur_pyr, dc, tab, pose_w, warm_rel):
        uv1, ok = lk.track_pyramid_reverse_checked(
            prev_pyr, cur_pyr, tab.uv, tab.active, tab.flow,
            win=cfg.lk_window, iters=cfg.lk_iters, levels=cfg.lk_levels,
            max_reverse_err=cfg.reverse_check_px,
            reverse_levels=cfg.lk_reverse_levels or None,
            iters_coarse=cfg.lk_iters_coarse or None,
            eps=cfg.lk_eps,
            affine=cfg.lk_affine,
            reverse_affine=cfg.lk_reverse_affine,
        )
        # row-wise gates shared verbatim with the unsharded path
        # (visual_frontend.depth_gates): each device evaluates its feature
        # shard against the replicated depth cloud — zero communication
        _, un0, un1, depth, has_depth, epi_ok = vf.depth_gates(
            uv1, ok, dc, tab, pose_w, cam
        )

        def psum_reduce(H, g, n_depth, sum_e):
            return (
                jax.lax.psum(H, DATA_AXIS),
                jax.lax.psum(g, DATA_AXIS),
                jax.lax.psum(n_depth, DATA_AXIS),
                jax.lax.psum(sum_e, DATA_AXIS),
            )

        rel = vf.solve_pose(
            warm_rel, un0, un1, depth, has_depth, epi_ok, cfg,
            reduce_fn=psum_reduce,
        )
        new_pose_w = se3.se3_compose(pose_w, se3.se3_inverse(rel))
        return uv1, ok, rel, new_pose_w

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(pyr_spec, pyr_spec, dc_spec, t_shard, pose_spec,
                  pose_spec),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), pose_spec, pose_spec),
        check_vma=False,
    )
    return jax.jit(fn)(prev_pyr, cur_pyr, prev_dc, table, pose_w, warm_rel)
