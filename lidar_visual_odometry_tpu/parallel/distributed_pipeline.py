"""End-to-end DISTRIBUTED SLAM driver over a device mesh.

The reference has no distributed capability (SURVEY.md §2.4: ROS pub/sub on
one machine is its only transport); this driver is the north-star composition
of the sharded stages that previously existed only as leaf functions
(VERDICT r2 missing item 2): per frame,

* feature extraction runs replicated (one scan, identical on every device),
* scan-to-scan GN runs data-parallel over current-frame features with the
  normal equations psum-reduced over the mesh
  (``parallel/sharded_odometry.py``),
* scan-to-map refinement shards the gathered local submap along its capacity
  axis — each device answers 5-NN queries against its slice, candidate sets
  merge with one ``all_gather`` (``parallel/sharded_mapping.py``) — at the
  ``mapping_skip_frame`` cadence of the reference's decoupled mapping thread
  (``laserOdometry.cpp:274-276``),
* the host ``CubeMap`` archive does the cube bookkeeping exactly like the
  single-device host driver (``models/lidar_mapping.LidarMapping``).

Collective bytes per frame (f32): odometry psums one (6, 6) + (6,) system
per GN iteration = 168 B × outer·gn iters ≈ 3.4 kB; mapping all_gathers
(Q, k) distances + (Q, k, 3) coordinates per outer iteration ≈ D·Q·k·16 B
(≈ 2.6 MB at D=8, Q=4096+8192, k=5) — both far under an ICI frame budget.

On this machine the mesh is 8 virtual CPU devices (no multi-chip hardware);
the driver validates the full composition — sharding layouts, collectives,
state hand-off — and `scripts/bench_scaling.py` records its per-stage
scaling structure. On a real slice the same code is the multi-chip mode.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import lidar_mapping as lm
from ..models import scan_registration as sr
from ..ops import pointcloud as pc
from ..ops import se3
from ..utils.config import SystemConfig
from . import sharded_mapping as sm
from . import sharded_odometry as so


class DistributedSlamPipeline:
    """scan → features → psum-reduced scan-to-scan → submap-sharded
    scan-to-map, end to end on one mesh."""

    def __init__(
        self,
        cfg: SystemConfig = SystemConfig(),
        n_devices: int | None = None,
        capacity: int = 131072,
    ):
        devices = jax.devices()
        if n_devices is not None:
            assert len(devices) >= n_devices, (
                f"need {n_devices} devices, have {len(devices)}"
            )
            devices = devices[:n_devices]
        self.mesh = so.make_mesh(devices)
        self.cfg = cfg
        self.capacity = capacity
        self.shard = NamedSharding(self.mesh, P(so.DATA_AXIS))
        self.rep = NamedSharding(self.mesh, P())

        self.mapper = lm.LidarMapping(cfg.mapping)
        self.pose_w = se3.identity_pose()
        self.pose_rel = se3.identity_pose()
        self._prev = None        # (less_sharp, less_flat) replicated
        self._frame = 0

    def _place(self, feats):
        """Queries (current frame) shard over the data axis; candidate
        clouds replicate (association streams rings per shard)."""
        return (
            jax.tree.map(lambda x: jax.device_put(x, self.shard), feats),
            jax.tree.map(lambda x: jax.device_put(x, self.rep), feats),
        )

    def process_scan(self, points: np.ndarray, map_skip: int = 1) -> se3.Pose:
        """Feed one raw scan; returns the map-refined world pose."""
        xyz, mask = pc.pad_points(np.asarray(points)[:, :3], self.capacity)
        reg = sr.register_scan(
            jnp.asarray(xyz), jnp.asarray(mask), self.cfg.lidar
        )
        f_shard, f_rep = self._place(reg.features)

        if self._prev is not None:
            rel = so.sharded_scan_to_scan(
                self.mesh, f_shard, *self._prev, self.pose_rel,
                self.cfg.odometry,
            )
            self.pose_w = se3.se3_compose(self.pose_w, rel)
            self.pose_rel = rel
        self._prev = (f_rep.less_sharp, f_rep.less_flat)
        return self._mapping_update(reg.features, map_skip)

    def _mapping_update(self, feats, map_skip: int = 1) -> se3.Pose:
        """Scan-to-map at the mapping cadence (submap sharded over the
        mesh); host ``CubeMap`` bookkeeping. Shared with the cam-lidar
        composition (distributed_camlidar.py)."""
        # scan-to-map at the mapping cadence; host CubeMap bookkeeping
        mcfg = self.cfg.mapping
        corner = np.asarray(feats.less_sharp.xyz)
        corner_m = np.asarray(feats.less_sharp.mask)
        surf = np.asarray(feats.less_flat.xyz)
        surf_m = np.asarray(feats.less_flat.mask)
        init = se3.se3_compose(self.mapper.correction, self.pose_w)

        if self._frame % map_skip == 0 and self.mapper.initialized:
            t_np = np.asarray(init.t)
            local = lm.LocalMap(
                self.mapper.corner_map.gather_local(
                    t_np, mcfg.submap_radius, mcfg.max_corner_map_local
                ),
                self.mapper.surf_map.gather_local(
                    t_np, mcfg.submap_radius, mcfg.max_surf_map_local
                ),
            )
            # the submap is THE distributed axis: slice per device
            local = jax.tree.map(
                lambda x: jax.device_put(x, self.shard), local
            )
            refined = sm.sharded_mapping_step(
                self.mesh,
                jax.device_put(feats.less_sharp.xyz, self.rep),
                jax.device_put(feats.less_sharp.mask, self.rep),
                jax.device_put(feats.less_flat.xyz, self.rep),
                jax.device_put(feats.less_flat.mask, self.rep),
                local, init, mcfg,
            )
            self.mapper.correction = se3.se3_compose(
                refined, se3.se3_inverse(self.pose_w)
            )
        else:
            refined = init
            self.mapper.initialized = True

        if self._frame % map_skip == 0:
            Rw = np.asarray(se3.quat_to_matrix(refined.q))
            tw = np.asarray(refined.t)
            self.mapper.corner_map.insert(corner[corner_m] @ Rw.T + tw)
            self.mapper.surf_map.insert(surf[surf_m] @ Rw.T + tw)
        self._frame += 1
        return refined

    def run(self, scans, map_skip: int = 1, progress: bool = False):
        """Returns (odom positions (N, 3), mapped positions (N, 3), wall s)."""
        import time

        t0 = time.time()
        odom_t, mapped = [], []
        for pts in scans:
            refined = self.process_scan(np.asarray(pts), map_skip=map_skip)
            odom_t.append(self.pose_w.t)
            mapped.append(refined)
        # real D2H before the clock (axon: block_until_ready returns
        # without draining — CLAUDE.md measurement trap)
        np.asarray(mapped[-1].t)
        wall = time.time() - t0
        if progress:
            print(
                f"distributed SLAM ({self.mesh.shape}): {len(scans)} frames "
                f"in {wall:.2f}s → {len(scans) / wall:.1f} fps"
            )
        return (
            np.stack([np.asarray(t) for t in odom_t]),
            np.stack([np.asarray(p.t) for p in mapped]),
            wall,
        )
