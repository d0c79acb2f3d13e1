"""Distributed composition of the FULL cam-lidar topology on one mesh.

The reference's actual runtime shape embeds the whole visual stack inside the
laserOdometry process (``laserOdometry.cpp:248,308``) while laserMapping
refines behind it on its own thread (``laserMapping.cpp:934``). This driver
is the multi-chip analog of THAT (VERDICT r4 next #1): per matched (scan,
image) pair,

* the visual frontend runs feature-parallel — LK + depth gates per feature
  shard, ONE ``psum`` per GN iteration (``sharded_visual.py``), with the
  table roll/replenish replicated (``visual_frontend.update_after_external_
  solve``),
* the visual relative pose, extrinsic-mapped and plausibility-gated
  (``cam_lidar_pipeline.visual_prior_gate``), warm-starts the psum-reduced
  scan-to-scan GN (``sharded_odometry.py``) — the reference's dormant
  coupling (``CamLidarProcess.cpp:278-307``) live on the mesh,
* scan-to-map refinement shards the gathered submap (``sharded_mapping.py``)
  at the mapping cadence, host ``CubeMap`` bookkeeping as in
  ``DistributedSlamPipeline``.

Ingest parity with the single-device fused path: scans pack to the polar
image on the host, features come from ``register_polar_impl``, and the
camera depth clouds derive on device via ``cam_clouds_from_polar`` — so the
composition is parity-testable against ``CamLidarPipeline(coupled=True)``
(tests/test_parallel.py::test_distributed_camlidar_matches_coupled).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..data.native_pack import pack_polar_chunk
from ..models import visual_frontend as vf
from ..models.cam_lidar_pipeline import (
    _map_cam_poses_to_lidar, _np_quat_from_matrix, cam_clouds_from_polar,
    visual_prior_gate,
)
from ..models.scan_registration import register_polar_impl
from ..ops import camera as cam_ops
from ..ops import image as image_ops
from ..ops import se3
from ..utils.config import SystemConfig
from . import sharded_odometry as so
from . import sharded_visual as sv
from .distributed_pipeline import DistributedSlamPipeline

_register_polar = jax.jit(
    lambda img, cfg: register_polar_impl(img, cfg).features,
    static_argnames=("cfg",),
)


@jax.jit
def _dequant_image(img_u8: jax.Array) -> jax.Array:
    return img_u8.astype(jnp.float32) * (1.0 / 255.0)


class DistributedCamLidarPipeline(DistributedSlamPipeline):
    """camera + lidar + mapping, all three sharded stages on one mesh."""

    def __init__(
        self,
        cfg: SystemConfig = SystemConfig(),
        n_devices: int | None = None,
        capacity: int = 131072,
        coupled: bool = True,
        max_prior_step: float = 2.0,
    ):
        super().__init__(cfg, n_devices=n_devices, capacity=capacity)
        self.coupled = coupled
        self.max_prior_step = max_prior_step
        self.cam = cam_ops.Pinhole.from_config(cfg.camera)

        E = np.asarray(cfg.extrinsic.matrix, np.float32)
        self.R_cl = E[:, :3]
        self.t_cl = E[:, 3]
        q_cl = _np_quat_from_matrix(self.R_cl)
        self.T_cam_lidar = se3.Pose(jnp.asarray(q_cl), jnp.asarray(self.t_cl))
        q_inv = q_cl * np.array([1.0, -1.0, -1.0, -1.0], np.float32)
        self.T_lidar_cam = se3.Pose(
            jnp.asarray(q_inv),
            jnp.asarray(-(self.R_cl.T @ self.t_cl).astype(np.float32)),
        )

        # visual carry (≡ VisualChunkState, kept as host attributes so each
        # stage stays its own program with explicit sharding)
        self.table = None
        self.pose_cam = se3.identity_pose()
        self.warm_rel = se3.identity_pose()
        self._prev_pyr = None
        self._prev_dc = None

    # -- per-frame pieces ---------------------------------------------------

    def _pack_scan(self, points: np.ndarray) -> np.ndarray:
        lcfg = self.cfg.lidar
        return pack_polar_chunk(
            [np.asarray(points)[:, :3]], n_scans=lcfg.n_scans,
            width=lcfg.azimuth_bins, min_range=lcfg.min_range,
            max_range=lcfg.max_range, n_frames=1, channels=2,
        )[0]

    def _prep_image(self, image: np.ndarray, first: bool) -> jax.Array:
        """Frame-0 images stay float (≡ init_chunk_state's direct float
        input in CamLidarPipeline.run_chunked); tracked frames take the
        uint8-upload round trip the fused chunk takes (¼ tunnel bytes),
        so quantization matches the single-device path frame for frame."""
        im = np.asarray(image)
        if first:
            img = jnp.asarray(im.astype(np.float32))
        else:
            if im.dtype != np.uint8:
                im = np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
            img = _dequant_image(jnp.asarray(im))
        cfg = self.cfg.visual
        if cfg.use_clahe:
            img = vf._clahe_jit(
                img, grid=cfg.clahe_grid, clip_limit=cfg.clahe_clip
            )
        return img

    def process_pair(
        self, points: np.ndarray, image: np.ndarray, map_skip: int = 1,
    ) -> tuple[se3.Pose, se3.Pose]:
        """One matched (scan, image) pair; returns (map-refined lidar world
        pose, camera-world visual pose)."""
        from ..models import scan_registration as sr
        from ..ops import pointcloud as pc

        cfg = self.cfg.visual
        first = self._prev is None
        raw = np.asarray(points)[:, :3]
        if first:
            # frame-0 lidar features via the float path — exactly the
            # bootstrap of CamLidarPipeline.run_chunked (register_scan on
            # the padded cloud); tracked frames use the polar ingest below
            xyz0, mask0 = pc.pad_points(raw, self.capacity)
            feats = sr.register_scan(
                jnp.asarray(xyz0), jnp.asarray(mask0), self.cfg.lidar
            ).features
            pimg = None
        else:
            pimg = jnp.asarray(self._pack_scan(points))
            feats = _register_polar(pimg, self.cfg.lidar)
        img = self._prep_image(image, first)
        pyr = tuple(image_ops.build_pyramid(img, cfg.lk_levels))

        if self._prev_pyr is None:
            # frame-0 bootstrap ≡ CamLidarPipeline.run_chunked: host-side
            # camera cloud (shared selection helper), replenish-only table
            from ..models.cam_lidar_pipeline import camera_cloud_select

            cxyz, cmask = camera_cloud_select(
                raw, self.R_cl, self.t_cl, cfg.depth_cloud_cap
            )
            dc = vf.build_depth_cloud(jnp.asarray(cxyz), jnp.asarray(cmask))
            self.table = vf._replenish_jit(
                vf.empty_table(cfg.max_tracked), pyr[0], self.cam,
                se3.identity_pose(), cfg,
            )
        else:
            # tracked frames derive the depth cloud ON DEVICE from the
            # already-uploaded polar scan (the single-device fused path's
            # transfer-bound choice, cam_clouds_from_polar)
            dcx, dcm = cam_clouds_from_polar(
                pimg[None], jnp.asarray(self.R_cl), jnp.asarray(self.t_cl),
                self.cfg.lidar, cfg.depth_cloud_cap,
            )
            dc = vf.build_depth_cloud(dcx[0], dcm[0])

        rel_cam = None
        n_tracked = None
        if self._prev_pyr is not None:
            uv1, ok, rel_cam, new_pose_cam = sv.sharded_visual_step(
                self.mesh, self._prev_pyr, pyr, self._prev_dc, self.table,
                self.pose_cam, self.warm_rel, self.cam, cfg,
            )
            table, _ = vf.update_after_external_solve(
                uv1, ok, self._prev_dc, self.table, self.pose_cam, rel_cam,
                self.cam,
            )
            # pre-replenish surviving-track count = the coupled gate's
            # tracking-health term (≡ chunk_frame_step's n_tracked)
            n_tracked = jnp.sum(table.active.astype(jnp.int32))
            self.table = vf._replenish_jit(
                table, pyr[0], self.cam, new_pose_cam, cfg
            )
            self.pose_cam = new_pose_cam
            self.warm_rel = rel_cam
        self._prev_pyr = pyr
        self._prev_dc = dc

        # lidar scan-to-scan, visually warm-started when coupled
        f_shard, f_rep = self._place(feats)
        if self._prev is not None:
            if self.coupled and rel_cam is not None:
                init = visual_prior_gate(
                    self.pose_rel, rel_cam, self.T_lidar_cam,
                    self.T_cam_lidar, self.max_prior_step,
                    n_tracked=n_tracked,
                    min_tracked=int(cfg.coupled_min_track_ratio
                                    * cfg.max_tracked),
                )
            else:
                init = self.pose_rel
            rel = so.sharded_scan_to_scan(
                self.mesh, f_shard, *self._prev, init, self.cfg.odometry,
            )
            self.pose_w = se3.se3_compose(self.pose_w, rel)
            self.pose_rel = rel
        self._prev = (f_rep.less_sharp, f_rep.less_flat)

        refined = self._mapping_update(feats, map_skip)
        return refined, self.pose_cam

    def run(self, scans, images, map_skip: int = 1, progress: bool = False):
        """Returns (odom (N,3), mapped (N,3), visual-in-lidar-frame (N,3),
        wall s)."""
        import time

        t0 = time.time()
        odom_t, mapped, vis = [], [], []
        for pts, img in zip(scans, images):
            refined, pose_cam = self.process_pair(
                np.asarray(pts), img, map_skip=map_skip
            )
            odom_t.append(self.pose_w.t)
            mapped.append(refined)
            vis.append(pose_cam)
        # force a real D2H before reading the clock (CLAUDE.md measurement
        # trap: block_until_ready on the axon relay returns without
        # draining)
        np.asarray(mapped[-1].t)
        wall = time.time() - t0
        _, vt = _map_cam_poses_to_lidar(
            jnp.stack([p.q for p in vis]), jnp.stack([p.t for p in vis]),
            self.T_lidar_cam, self.T_cam_lidar,
        )
        if progress:
            n = len(mapped)
            print(
                f"distributed cam-lidar ({self.mesh.shape}): {n} frames in "
                f"{wall:.2f}s → {(n - 1) / wall:.1f} fps"
            )
        return (
            np.stack([np.asarray(t) for t in odom_t]),
            np.stack([np.asarray(p.t) for p in mapped]),
            np.asarray(vt),
            wall,
        )
