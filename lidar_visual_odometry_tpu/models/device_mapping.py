"""Device-resident scan-to-map refinement (TPU-optimized ≡ laserMapping).

The host-cube-map driver (``lidar_mapping.LidarMapping``) is faithful to the
reference's unbounded 21×21×11 cube store (``laserMapping.cpp:74-104``) but
pays a per-frame host→device transfer of the gathered submap (~0.6 MB ≈ 60 ms
over the tunneled-TPU link) plus a host sync for cube bookkeeping. This module
keeps the local map on device instead, so the whole mapping stage is one
jitted program per frame with zero extra transfers:

* **Map = bounded voxel store** (``ops/voxel_map.voxel_merge``): a flat
  fixed-capacity world-frame point tensor per feature class, deduped at the
  mapping leaf (one point per 0.4/0.8 m cell ≡ the reference's per-cube voxel
  filtering, ``laserMapping.cpp:787-801``) with farthest-first eviction and
  leaf-aligned recentering — the reference's 5×5×3-of-50 m-cubes neighborhood
  (``laserMapping.cpp:512-537``) as index arithmetic. At the default
  capacities (16k corner / 32k surf ≈ the host driver's gather caps) the map
  retains minutes of geometry: revisits and slow turns keep their constraints
  (the round-1 8-frame ring buffer lost them after ~1 s, and truncating the
  per-frame slabs corrupted association outright).
* **Solve** is the shared scan-to-map GN core (``lidar_mapping.solve_map_pose``:
  Pallas 5-NN streaming top-k, closed-form line/plane fits, Huber GN),
  against the stored map as the candidate cloud.
* **Correction chain** ``wmap_T_odom`` (``laserMapping.cpp:142-152``) lives in
  the carried state, so skipped frames (mapping_skip_frame) compose entirely
  on device too.

The host ``CubeMap`` archive remains available for checkpoints/export; it can
be fed asynchronously from the same (features, pose) stream without stalling
this path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.features import ScanFeatures
from ..ops.pointcloud import PointBatch, voxel_downsample
from ..ops.voxel_map import voxel_merge
from ..utils.config import MappingConfig
from .lidar_mapping import solve_map_pose


class DeviceMapState(NamedTuple):
    corner: jax.Array       # (map_corner_cap, 3) world frame
    corner_mask: jax.Array  # (map_corner_cap,)
    surf: jax.Array         # (map_surf_cap, 3)
    surf_mask: jax.Array    # (map_surf_cap,)
    correction: se3.Pose    # wmap_T_odom


def init_state(cfg: MappingConfig) -> DeviceMapState:
    return DeviceMapState(
        corner=jnp.zeros((cfg.map_corner_cap, 3), jnp.float32),
        corner_mask=jnp.zeros((cfg.map_corner_cap,), bool),
        surf=jnp.zeros((cfg.map_surf_cap, 3), jnp.float32),
        surf_mask=jnp.zeros((cfg.map_surf_cap,), bool),
        correction=se3.identity_pose(),
    )


def device_mapping_impl(
    state: DeviceMapState,
    corner_pts: jax.Array, corner_mask: jax.Array,
    surf_pts: jax.Array, surf_mask: jax.Array,
    odom_pose: se3.Pose,
    cfg: MappingConfig,
) -> tuple[DeviceMapState, se3.Pose]:
    """One mapping frame fully on device: downsample → solve → insert.

    Returns (new state, refined world pose). On the first frame the map is
    empty, the GN accumulates nothing (zero step) and the frame seeds the map
    — the reference's ``initialized`` branch falls out of the algebra.
    Pure function: composable into fused/scanned chunk programs.
    """
    corner_ds = voxel_downsample(
        corner_pts, corner_mask, leaf=cfg.corner_leaf, max_out=cfg.corner_slot
    )
    surf_ds = voxel_downsample(
        surf_pts, surf_mask, leaf=cfg.surf_leaf, max_out=cfg.surf_slot
    )

    init = se3.se3_compose(state.correction, odom_pose)
    refined = solve_map_pose(
        corner_ds, surf_ds,
        PointBatch(state.corner, state.corner_mask),
        PointBatch(state.surf, state.surf_mask),
        init, cfg,
    )

    # merge the refined-world-frame slab into the bounded voxel store
    cw = se3.se3_apply(refined, corner_ds.xyz)
    sw = se3.se3_apply(refined, surf_ds.xyz)
    new_corner = voxel_merge(
        state.corner, state.corner_mask, cw, corner_ds.mask, refined.t,
        leaf=cfg.corner_leaf, cap=cfg.map_corner_cap,
        drop_radius=cfg.map_drop_radius,
    )
    new_surf = voxel_merge(
        state.surf, state.surf_mask, sw, surf_ds.mask, refined.t,
        leaf=cfg.surf_leaf, cap=cfg.map_surf_cap,
        drop_radius=cfg.map_drop_radius,
    )
    new_state = DeviceMapState(
        corner=new_corner.xyz,
        corner_mask=new_corner.mask,
        surf=new_surf.xyz,
        surf_mask=new_surf.mask,
        correction=se3.se3_compose(refined, se3.se3_inverse(odom_pose)),
    )
    return new_state, refined


# NB: no buffer donation — freshly-initialized states alias the identity
# pose across fields (donating the same buffer twice is an XLA error), and
# the state is ~1 MB: not worth the aliasing hazard.
device_mapping_step = partial(jax.jit, static_argnames=("cfg",))(
    device_mapping_impl
)


@partial(jax.jit, static_argnames=())
def _apply_correction(correction: se3.Pose, odom_pose: se3.Pose) -> se3.Pose:
    return se3.se3_compose(correction, odom_pose)


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg", "map_cfg",
                                   "map_skip"))
def slam_chunk_quantized(
    odo_state,
    map_state: DeviceMapState,
    qpts: jax.Array,      # (K, N, 3) uint16 (lidar_odometry.quantize_scan)
    counts: jax.Array,    # (K,) int32
    lidar_cfg,
    odom_cfg,
    map_cfg: MappingConfig,
    start_idx: jax.Array | int = 0,
    map_skip: int = 1,
):
    """K frames of the FULL lidar stack in one device program: dequantize →
    feature extraction → scan-to-scan GN → scan-to-map GN → map insert.

    The reference runs these as three ROS processes exchanging ~10 MB clouds
    per frame (SURVEY.md §3.2-3.5); here the whole chain is a ``lax.scan``
    whose carried state (odometry features + the bounded voxel map) never
    leaves HBM. Returns (odo_state, map_state, odom poses (K,), mapped
    poses (K,)).

    map_skip ≥ 2 runs the scan-to-map solve every map_skip-th frame (global
    index ``start_idx + i``) and composes the carried wmap_T_odom correction
    in between — the reference's decoupled ~5 Hz mapping thread
    (``laserOdometry.cpp:274-276`` skipFrameNum, ``laserMapping.cpp:934``).
    The mapping stage is ~85% of per-frame device time (NN association), so
    skip=2 nearly doubles fused-SLAM throughput.
    """
    from .lidar_odometry import QUANT_OFFSET, QUANT_SCALE
    from .scan_registration import register_scan_impl

    idx = jnp.arange(qpts.shape[1], dtype=jnp.int32)

    def feats_of(frame):
        qp, n = frame
        xyz = qp.astype(jnp.float32) * QUANT_SCALE + QUANT_OFFSET
        return register_scan_impl(xyz, idx < n, lidar_cfg).features

    return _slam_scan(
        odo_state, map_state, (qpts, counts), feats_of,
        odom_cfg, map_cfg, start_idx, map_skip, qpts.shape[0],
    )


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg", "map_cfg",
                                   "map_skip"))
def slam_chunk_polar(
    odo_state,
    map_state: DeviceMapState,
    imgs: jax.Array,      # (K, R, W, 2) uint16 (pointcloud.pack_polar_scan)
    lidar_cfg,
    odom_cfg,
    map_cfg: MappingConfig,
    start_idx: jax.Array | int = 0,
    map_skip: int = 1,
):
    """slam_chunk over packed polar images (4 bytes/cell H2D; decode lands
    on the compacted grid — see pointcloud.pack_polar_scan)."""
    from .scan_registration import register_polar_impl

    def feats_of(img):
        return register_polar_impl(img, lidar_cfg).features

    return _slam_scan(
        odo_state, map_state, imgs, feats_of,
        odom_cfg, map_cfg, start_idx, map_skip, imgs.shape[0],
    )


def _slam_scan(
    odo_state, map_state, payload, feats_of,
    odom_cfg, map_cfg, start_idx, map_skip, K: int,
):
    from .lidar_odometry import odometry_step

    def step(carry, frame):
        odo, mp = carry
        payload_i, i = frame
        feats = feats_of(payload_i)
        odo, pose_w = odometry_step(odo, feats, odom_cfg)
        if map_skip <= 1:
            mp, refined = device_mapping_impl(
                mp, feats.less_sharp.xyz, feats.less_sharp.mask,
                feats.less_flat.xyz, feats.less_flat.mask, pose_w, map_cfg,
            )
        else:
            mp, refined = jax.lax.cond(
                i % map_skip == 0,
                lambda mp, pose_w: device_mapping_impl(
                    mp, feats.less_sharp.xyz, feats.less_sharp.mask,
                    feats.less_flat.xyz, feats.less_flat.mask,
                    pose_w, map_cfg,
                ),
                lambda mp, pose_w: (
                    mp, se3.se3_compose(mp.correction, pose_w)
                ),
                mp, pose_w,
            )
        return (odo, mp), (pose_w, refined)

    frame_ids = jnp.asarray(start_idx, jnp.int32) + jnp.arange(K, dtype=jnp.int32)
    (odo_state, map_state), (odom_poses, mapped_poses) = jax.lax.scan(
        step, (odo_state, map_state), (payload, frame_ids)
    )
    return odo_state, map_state, odom_poses, mapped_poses


class DeviceMapping:
    """Host driver for the device-resident mapping stage.

    Same interface as ``lidar_mapping.LidarMapping`` but never syncs with the
    host: poses stay on device, dispatch is fully pipelined (the tunnel's
    ~30 ms round-trip is amortized by queue depth, as in the odometry path).
    """

    def __init__(self, cfg: MappingConfig = MappingConfig()):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._frame = 0

    def process(self, feats: ScanFeatures, odom_pose: se3.Pose,
                skip: int = 1) -> se3.Pose:
        """Refine ``odom_pose`` against the device map every ``skip`` frames
        (≡ mapping_skip_frame); in between, compose the last correction."""
        if self._frame % skip == 0:
            self.state, refined = device_mapping_step(
                self.state,
                feats.less_sharp.xyz, feats.less_sharp.mask,
                feats.less_flat.xyz, feats.less_flat.mask,
                odom_pose, self.cfg,
            )
        else:
            refined = _apply_correction(self.state.correction, odom_pose)
        self._frame += 1
        return refined

    def export_map(self) -> tuple[np.ndarray, np.ndarray]:
        """D2H snapshot of the live map (corner, surf world points) —
        feed to ``CubeMap.insert`` for archival/checkpointing."""
        c = np.asarray(self.state.corner)
        cm = np.asarray(self.state.corner_mask)
        s = np.asarray(self.state.surf)
        sm = np.asarray(self.state.surf_mask)
        return c[cm], s[sm]
