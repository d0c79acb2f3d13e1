"""Distributed scan-to-map refinement: the local submap sharded across the
mesh.

The map is the component that grows with trajectory length (SURVEY.md §5
"long-context" analog), so it is the natural spatial-sharding axis: each
device owns a slice of the gathered local submap (cube granularity upstream,
point granularity here), answers 5-NN queries against its slice, and the
per-device candidate sets merge with one ``all_gather`` of (Q, k) distances +
coordinates — after which fits and the GN pose solve proceed replicated
(identical on every device).

Per outer iteration the collective moves Q·k·4 floats (≈1 MB at Q=8k, k=5)
across ICI — far below the frame budget; the O(Q·C) distance work divides by
the mesh size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.lidar_mapping import LocalMap
from ..ops import fit, gn, knn, lidar_factors as lf, se3
from ..ops.pointcloud import PointBatch, voxel_downsample
from ..utils.config import MappingConfig

DATA_AXIS = "data"


def sharded_mapping_step(
    mesh: Mesh,
    corner_pts: jax.Array, corner_mask: jax.Array,
    surf_pts: jax.Array, surf_mask: jax.Array,
    local: LocalMap,
    init_pose: se3.Pose,
    cfg: MappingConfig,
) -> se3.Pose:
    """Distributed drop-in for ``lidar_mapping.mapping_step``: the local
    corner/surf submaps shard over the mesh along their capacity axis."""

    def body(corner_pts, corner_mask, surf_pts, surf_mask,
             lc_xyz, lc_mask, ls_xyz, ls_mask, init_pose):
        corner_ds = voxel_downsample(
            corner_pts, corner_mask, leaf=cfg.corner_leaf, max_out=4096
        )
        surf_ds = voxel_downsample(
            surf_pts, surf_mask, leaf=cfg.surf_leaf, max_out=8192
        )

        def nn5_merged(qpts, c_xyz, c_mask):
            # per-shard k-NN on the local slice …
            idx, dist = knn.knn(qpts, c_xyz, c_mask, cfg.knn, chunk=2048)
            nbrs = c_xyz[idx]                            # (Q, k, 3)
            # … then merge candidates across shards: gather (D, Q, k)
            all_d = jax.lax.all_gather(dist, DATA_AXIS)   # (D, Q, k)
            all_n = jax.lax.all_gather(nbrs, DATA_AXIS)   # (D, Q, k, 3)
            D = all_d.shape[0]
            Q = dist.shape[0]
            md = all_d.transpose(1, 0, 2).reshape(Q, D * cfg.knn)
            mn = all_n.transpose(1, 0, 2, 3).reshape(Q, D * cfg.knn, 3)
            neg, sel = jax.lax.top_k(-md, cfg.knn)
            return -neg, jnp.take_along_axis(mn, sel[..., None], axis=1)

        def outer(pose, _):
            cw = se3.se3_apply(pose, corner_ds.xyz)
            cdist, cnbrs = nn5_merged(cw, lc_xyz, lc_mask)
            cnbr_ok = cdist < cfg.corner_nn_max_dist**2
            centroid, direction, line_ok = fit.line_fit(
                cnbrs, cnbr_ok, eig_ratio=cfg.line_eig_ratio
            )
            edge = lf.EdgeCorr(
                p=corner_ds.xyz,
                a=centroid + 0.1 * direction,
                b=centroid - 0.1 * direction,
                s=jnp.ones(corner_ds.xyz.shape[:1], jnp.float32),
                mask=corner_ds.mask & line_ok,
            )
            sw = se3.se3_apply(pose, surf_ds.xyz)
            sdist, snbrs = nn5_merged(sw, ls_xyz, ls_mask)
            n, d, plane_ok = fit.plane_fit(
                snbrs, sdist < 1.0, tol=cfg.plane_fit_tol
            )
            plane = lf.NormPlaneCorr(
                p=surf_ds.xyz, n=n, d=d, mask=surf_ds.mask & plane_ok
            )

            def inner(pose, _):
                re, Je = lf.edge_residuals(pose, edge)
                rp, Jp = lf.norm_plane_residuals(pose, plane)
                we = gn.huber_weight(
                    jnp.linalg.norm(re, axis=-1), cfg.huber_delta
                )
                wp = gn.huber_weight(jnp.abs(rp[..., 0]), cfg.huber_delta)
                He, ge = gn.accumulate(re, Je, we, edge.mask)
                Hp, gp = gn.accumulate(rp, Jp, wp, plane.mask)
                delta = gn.solve_damped(He + Hp, ge + gp)
                return gn.gn_update_pose(pose, delta), None

            pose, _ = jax.lax.scan(inner, pose, None, length=cfg.gn_iters)
            return pose, None

        if cfg.outer_tol > 0.0:
            # adaptive re-association, identical to the single-device core
            # (lidar_mapping.solve_map_pose) — the carry is replicated, so
            # every device takes the same exit and stays in lockstep
            def cond(carry):
                pose, pq, pt, i = carry
                dq = jnp.max(jnp.abs(pose.q - pq * jnp.sign(
                    jnp.sum(pose.q * pq))))
                dt = jnp.max(jnp.abs(pose.t - pt))
                moved = (2.0 * dq > cfg.outer_tol) | (dt > cfg.outer_tol)
                return (i < cfg.outer_iters) & ((i < 2) | moved)

            def wbody(carry):
                pose, _, _, i = carry
                return (outer(pose, None)[0], pose.q, pose.t, i + 1)

            pose, _, _, _ = jax.lax.while_loop(
                cond, wbody,
                (init_pose, init_pose.q, init_pose.t,
                 jnp.asarray(0, jnp.int32)),
            )
            return pose

        pose, _ = jax.lax.scan(outer, init_pose, None, length=cfg.outer_iters)
        return pose

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),                   # current features replicated
            P(DATA_AXIS, None), P(DATA_AXIS),     # corner submap sharded
            P(DATA_AXIS, None), P(DATA_AXIS),     # surf submap sharded
            se3.Pose(P(), P()),
        ),
        out_specs=se3.Pose(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(
        corner_pts, corner_mask, surf_pts, surf_mask,
        local.corner.xyz, local.corner.mask,
        local.surf.xyz, local.surf.mask,
        init_pose,
    )
