"""Scan-to-map refinement (≡ laserMapping node, TPU-native split).

The reference keeps a 21×21×11 grid of 50 m voxel cubes of corner/surf points
(``laserMapping.cpp:74-104``), gathers a 5×5×3 neighborhood submap each frame,
kd-tree-associates, and Ceres-solves the world pose, then scatters de-skewed
features back into cubes with voxel filtering and recenters the grid when the
pose nears an edge (``:323-507``).

TPU-native split:

* **Host ``CubeMap``** owns the sparse cube store (dict of numpy arrays) —
  insertion, per-cube voxel filtering, and recentering are pointer bookkeeping
  the device shouldn't burn cycles on; the store is unbounded like the
  reference's. This is also the unit of spatial sharding for the multi-host
  layer (each host owns a cube range).
* **Device ``mapping_step``** does all math: 5-NN over the padded local
  submap (streamed top-k), batched closed-form line/plane fits (ops/fit.py),
  and the Gauss-Newton pose solve with Huber weights — one jitted program per
  frame, same structure as the reference's 10×(associate → 4 GN iters).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import fit, gn, knn, lidar_factors as lf, se3
from ..ops.features import ScanFeatures
from ..ops.pointcloud import PointBatch
from ..utils.config import MappingConfig


class LocalMap(NamedTuple):
    corner: PointBatch
    surf: PointBatch


def solve_map_pose(
    corner_q: PointBatch,
    surf_q: PointBatch,
    corner_cand: PointBatch,
    surf_cand: PointBatch,
    init_pose: se3.Pose,
    cfg: MappingConfig,
) -> se3.Pose:
    """The scan-to-map Gauss-Newton core, shared by the host-cube-map and
    device-resident-map drivers: ``outer_iters`` rounds of {5-NN association
    → line/plane fits → ``gn_iters`` GN iterations}, mirroring the
    reference's 10×(associate → 4 Ceres iters) (laserMapping.cpp:562-721).

    Queries are current-frame features (lidar frame, downsampled at mapping
    leaf sizes); candidates are world-frame map points. An empty candidate
    set yields H=0, g=0 → zero step (cold start needs no special case).
    """
    import math

    corner_pts_d, corner_mask_d = corner_q.xyz, corner_q.mask
    surf_pts_d, surf_mask_d = surf_q.xyz, surf_q.mask

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from ..ops import pallas_nn
    # Cell-windowed association (ops/pallas_nn.block_topk_windowed): both
    # sides sorted by a 2 m coarse-cell raster key so the kernel can skip
    # ~80-95% of the candidate chunks per query tile. Exact for the 1 m
    # association gates (cell ≥ gate); requires TPU tiles to divide.
    windowed = (
        on_tpu
        and cfg.windowed_nn
        and cfg.nn_cell >= max(1.0, cfg.corner_nn_max_dist)
        and corner_cand.xyz.shape[0] % 512 == 0
        and surf_cand.xyz.shape[0] % 512 == 0
    )

    if windowed:
        half = (cfg.nn_grid_w // 2) * cfg.nn_cell
        origin = init_pose.t[:2] - half
        ckw = dict(cell=cfg.nn_cell, grid_w=cfg.nn_grid_w)
        corner_sorted, corner_keys = pallas_nn.sort_by_cell(
            corner_cand.xyz, corner_cand.mask, origin, **ckw
        )
        surf_sorted, surf_keys = pallas_nn.sort_by_cell(
            surf_cand.xyz, surf_cand.mask, origin, **ckw
        )

        def sort_queries(pts, mask):
            # sort by the init-pose world cell so query tiles are spatially
            # tight (efficiency only — ranges are recomputed per iteration)
            w = se3.se3_apply(init_pose, pts)
            keys = pallas_nn.cell_keys(w, origin, **ckw)
            _, xs, ys, zs, ms = jax.lax.sort(
                (keys, pts[:, 0], pts[:, 1], pts[:, 2],
                 mask.astype(jnp.int32)),
                num_keys=1,
            )
            return jnp.stack([xs, ys, zs], axis=-1), ms.astype(bool)

        corner_pts_d, corner_mask_d = sort_queries(
            corner_pts_d, corner_mask_d
        )
        surf_pts_d, surf_mask_d = sort_queries(surf_pts_d, surf_mask_d)
        prepped = {
            "corner": (corner_sorted, corner_keys),
            "surf": (surf_sorted, surf_keys),
        }

    def nn5(qpts, cands: PointBatch, q_tile, which=None):
        """(dist (Q,5), nbr coords (Q,5,3)) — Pallas streaming top-k on TPU
        (index-carrying kernel + one small gather), XLA chunked top-k
        elsewhere. Unfilled slots (dist ≥ 1e30) gather candidate 0 — every
        consumer gates on the distance first."""
        if windowed:
            c_sorted, c_keys = prepped[which]
            qk = pallas_nn.cell_keys(qpts, origin, **ckw)
            dist, idx = pallas_nn.block_topk_windowed(
                qpts, qk, c_sorted, c_keys, k=cfg.knn,
                q_tile=math.gcd(qpts.shape[0], cfg.nn_q_tile),
                grid_w=cfg.nn_grid_w,
            )
            return dist, c_sorted[idx]
        q_tile = math.gcd(qpts.shape[0], q_tile)
        if on_tpu:
            baked = pallas_nn.bake_mask(cands.xyz, cands.mask)
            dist, idx = pallas_nn.block_topk(
                qpts, baked, k=cfg.knn, q_tile=q_tile
            )
            return dist, baked[idx]
        idx, dist = knn.knn(qpts, cands.xyz, cands.mask, cfg.knn, chunk=4096)
        return dist, cands.xyz[idx]

    local = LocalMap(corner_cand, surf_cand)

    def outer(pose, _):
        # --- corner → line association (laserMapping.cpp:577-621) ---
        cw = se3.se3_apply(pose, corner_pts_d)
        cdist, cnbrs = nn5(cw, local.corner, 1024, which="corner")
        # 5th NN within 1 m² (laserMapping.cpp:584)
        cnbr_ok = cdist < cfg.corner_nn_max_dist**2
        centroid, direction, line_ok = fit.line_fit(
            cnbrs, cnbr_ok, eig_ratio=cfg.line_eig_ratio
        )
        # two virtual points ±0.1 m along the line (laserMapping.cpp:604-609)
        a = centroid + 0.1 * direction
        b = centroid - 0.1 * direction
        edge = lf.EdgeCorr(
            p=corner_pts_d, a=a, b=b,
            s=jnp.ones(corner_pts_d.shape[:1], corner_pts_d.dtype),
            mask=corner_mask_d & line_ok,
        )

        # --- surf → plane association (laserMapping.cpp:643-687) ---
        sw = se3.se3_apply(pose, surf_pts_d)
        sdist, snbrs = nn5(sw, local.surf, 1024, which="surf")
        snbr_ok = sdist < 1.0                      # (laserMapping.cpp:653)
        n, d, plane_ok = fit.plane_fit(snbrs, snbr_ok, tol=cfg.plane_fit_tol)
        plane = lf.NormPlaneCorr(
            p=surf_pts_d, n=n, d=d, mask=surf_mask_d & plane_ok
        )

        def inner(pose, _):
            re, Je = lf.edge_residuals(pose, edge)
            rp, Jp = lf.norm_plane_residuals(pose, plane)
            we = gn.huber_weight(jnp.linalg.norm(re, axis=-1), cfg.huber_delta)
            wp = gn.huber_weight(jnp.abs(rp[..., 0]), cfg.huber_delta)
            He, ge = gn.accumulate(re, Je, we, edge.mask)
            Hp, gp = gn.accumulate(rp, Jp, wp, plane.mask)
            delta = gn.solve_damped(He + Hp, ge + gp)
            return gn.gn_update_pose(pose, delta), None

        pose, _ = jax.lax.scan(inner, pose, None, length=cfg.gn_iters)
        return pose, None

    if cfg.outer_tol > 0.0:
        # Adaptive re-association, same pattern as the odometry outer loop
        # (lidar_odometry.scan_to_scan_impl): ≤ outer_iters rounds, early
        # exit when one round stops moving the pose. The round-3 sweep on
        # the rotation regime (BASELINE.md) showed the mapped ATE still
        # improving from 2 → 4 fixed rounds (0.052 → 0.034 m) once the
        # odometry prior got sharper; adaptive pays for the extra rounds
        # only where re-association still changes correspondences —
        # matching the reference's fixed 10 (laserMapping.cpp:562) at
        # smooth-frame cost.
        def cond(carry):
            pose, pq, pt, i = carry
            dq = jnp.max(jnp.abs(pose.q - pq * jnp.sign(
                jnp.sum(pose.q * pq))))
            dt = jnp.max(jnp.abs(pose.t - pt))
            moved = (2.0 * dq > cfg.outer_tol) | (dt > cfg.outer_tol)
            return (i < cfg.outer_iters) & ((i < 2) | moved)

        def body(carry):
            pose, _, _, i = carry
            return (outer(pose, None)[0], pose.q, pose.t, i + 1)

        pose, _, _, _ = jax.lax.while_loop(
            cond, body,
            (init_pose, init_pose.q, init_pose.t, jnp.asarray(0, jnp.int32)),
        )
        return pose

    pose, _ = jax.lax.scan(outer, init_pose, None, length=cfg.outer_iters)
    return pose


@partial(jax.jit, static_argnames=("cfg",))
def mapping_step(
    corner_pts: jax.Array, corner_mask: jax.Array,
    surf_pts: jax.Array, surf_mask: jax.Array,
    local: LocalMap,
    init_pose: se3.Pose,
    cfg: MappingConfig,
) -> se3.Pose:
    """Refine the world pose of the current frame against the local submap.

    corner/surf_pts: current-frame features (lidar frame); they are
    voxel-downsampled at the mapping leaf sizes before association, like the
    reference's per-frame stack filtering (laserMapping.cpp:542-550).
    init_pose: map-corrected initial guess (wmap_T_odom ∘ odom pose,
    ``transformAssociateToMap`` laserMapping.cpp:142-146).
    """
    from ..ops.pointcloud import voxel_downsample

    corner_ds = voxel_downsample(
        corner_pts, corner_mask, leaf=cfg.corner_leaf, max_out=4096
    )
    surf_ds = voxel_downsample(
        surf_pts, surf_mask, leaf=cfg.surf_leaf, max_out=8192
    )
    return solve_map_pose(
        corner_ds, surf_ds, local.corner, local.surf, init_pose, cfg
    )


class CubeMap:
    """Host-side sparse 50 m cube store for one feature class."""

    def __init__(self, cube_size: float, leaf: float):
        self.cube_size = cube_size
        self.leaf = leaf
        self.cubes: dict[tuple[int, int, int], np.ndarray] = {}

    def _key(self, xyz: np.ndarray) -> np.ndarray:
        # reference centers cells: cube i covers [(i-0.5)·50, (i+0.5)·50)
        # (laserMapping.cpp:312-321 with the negative-floor correction)
        return np.floor(xyz / self.cube_size + 0.5).astype(np.int64)

    def insert(self, xyz: np.ndarray) -> None:
        """Insert points, then re-voxel-filter the touched cubes
        (laserMapping.cpp:736-801)."""
        if xyz.size == 0:
            return
        keys = self._key(xyz)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        for i, k in enumerate(map(tuple, uniq)):
            pts = xyz[inv == i]
            old = self.cubes.get(k)
            allpts = pts if old is None else np.concatenate([old, pts])
            self.cubes[k] = self._voxel_filter(allpts)

    def _voxel_filter(self, pts: np.ndarray) -> np.ndarray:
        q = np.floor(pts / self.leaf).astype(np.int64)
        _, idx_start, inv = np.unique(
            q, axis=0, return_index=True, return_inverse=True
        )
        sums = np.zeros((idx_start.shape[0], 3), np.float64)
        np.add.at(sums, inv, pts)
        cnt = np.bincount(inv, minlength=idx_start.shape[0])[:, None]
        return (sums / cnt).astype(np.float32)

    def gather_local(
        self, center_xyz: np.ndarray, radius: tuple[int, int, int], cap: int
    ) -> PointBatch:
        """Concatenate the (2rx+1)×(2ry+1)×(2rz+1) cube neighborhood around
        the pose, padded to ``cap`` (laserMapping.cpp:512-537)."""
        ck = self._key(center_xyz[None])[0]
        parts = []
        for dx in range(-radius[0], radius[0] + 1):
            for dy in range(-radius[1], radius[1] + 1):
                for dz in range(-radius[2], radius[2] + 1):
                    c = self.cubes.get((ck[0] + dx, ck[1] + dy, ck[2] + dz))
                    if c is not None:
                        parts.append(c)
        pts = (
            np.concatenate(parts) if parts else np.zeros((0, 3), np.float32)
        )
        if pts.shape[0] > cap:
            # deterministic subsample: every k-th point
            stride = pts.shape[0] // cap + 1
            pts = pts[::stride][:cap]
        out = np.zeros((cap, 3), np.float32)
        mask = np.zeros((cap,), bool)
        out[: pts.shape[0]] = pts
        mask[: pts.shape[0]] = True
        return PointBatch(jnp.asarray(out), jnp.asarray(mask))


class LidarMapping:
    """Host driver: map-corrected pose + cube bookkeeping (≡ laserMapping)."""

    def __init__(self, cfg: MappingConfig = MappingConfig()):
        self.cfg = cfg
        self.corner_map = CubeMap(cfg.cube_size, cfg.corner_leaf)
        self.surf_map = CubeMap(cfg.cube_size, cfg.surf_leaf)
        # wmap_T_odom drift correction (laserMapping.cpp:110-117)
        self.correction = se3.identity_pose()
        self.initialized = False

    def process(
        self,
        feats: ScanFeatures,
        odom_pose: se3.Pose,
    ) -> se3.Pose:
        """Refine odometry pose against the map; insert features; return the
        map-refined world pose."""
        corner = np.asarray(feats.less_sharp.xyz)
        corner_m = np.asarray(feats.less_sharp.mask)
        surf = np.asarray(feats.less_flat.xyz)
        surf_m = np.asarray(feats.less_flat.mask)

        init = se3.se3_compose(self.correction, odom_pose)

        if self.initialized:
            t_np = np.asarray(init.t)
            local = LocalMap(
                self.corner_map.gather_local(
                    t_np, self.cfg.submap_radius, self.cfg.max_corner_map_local
                ),
                self.surf_map.gather_local(
                    t_np, self.cfg.submap_radius, self.cfg.max_surf_map_local
                ),
            )
            refined = mapping_step(
                feats.less_sharp.xyz, feats.less_sharp.mask,
                feats.less_flat.xyz, feats.less_flat.mask,
                local, init, self.cfg,
            )
        else:
            refined = init
            self.initialized = True

        # update correction: wmap_T_odom = refined ∘ odom⁻¹ (transformUpdate)
        self.correction = se3.se3_compose(refined, se3.se3_inverse(odom_pose))

        # insert de-skewed world-frame features
        Rw = np.asarray(se3.quat_to_matrix(refined.q))
        tw = np.asarray(refined.t)
        self.corner_map.insert(corner[corner_m] @ Rw.T + tw)
        self.surf_map.insert(surf[surf_m] @ Rw.T + tw)
        return refined
