"""Combined camera-lidar odometry system (≡ CamLidarProcess + laserOdometry).

The reference's laserOdometry node embeds the whole visual stack: a
CamLidarProcess with three threads pairs images with clouds, transforms the
cloud into the camera frame by the extrinsic (``CamLidarProcess.cpp:250-266``),
builds a Frame, and runs ``Frontend::trackfeature``, while the same process
independently runs lidar scan-to-scan (SURVEY.md §3.3-3.4 — the two estimators
run side by side, unfused, in the shipped code).

This driver reproduces that topology without threads: per matched (scan,
image) pair it dispatches the lidar path (register + scan-to-scan [+ mapping])
and the visual path (frontend VO on the camera-frame cloud), both
asynchronous device programs, and reports both trajectories — the visual one
mapped back to the lidar frame via ``T_w_lidar = T_w_cam · T_cam_lidar``
(``CamLidarProcess.cpp:284-293``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..data.sync import match_nearest
from ..models import lidar_odometry as lo
from ..models import scan_registration as sr
from ..models import visual_frontend as vf
from ..ops import camera as cam_ops
from ..ops import pointcloud as pc
from ..ops import se3
from ..utils.config import SystemConfig


@dataclass
class CamLidarResult:
    lidar_positions: np.ndarray     # (N, 3) lidar-odometry trajectory
    visual_positions: np.ndarray    # (N, 3) visual odometry in lidar frame
    lidar_quats: np.ndarray
    visual_quats: np.ndarray


class CamLidarPipeline:
    def __init__(self, cfg: SystemConfig = SystemConfig(), capacity: int = 131072):
        self.cfg = cfg
        self.capacity = capacity
        self.odom = lo.LidarOdometry(cfg.odometry)
        self.cam = cam_ops.Pinhole.from_config(cfg.camera)
        self.vo = vf.VisualOdometry(self.cam, cfg.visual)
        # T_cam_lidar extrinsic (Config camlidar 3×4 ≡ KITTI Tr)
        E = np.asarray(cfg.extrinsic.matrix, np.float32)
        self.R_cl = E[:, :3]
        self.t_cl = E[:, 3]
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = self.R_cl
        T[:3, 3] = self.t_cl
        self.T_cam_lidar = se3.se3_from_matrix(jnp.asarray(T))
        self.T_lidar_cam = se3.se3_inverse(self.T_cam_lidar)

    def _cloud_to_camera(self, pts: np.ndarray) -> np.ndarray:
        return pts @ self.R_cl.T + self.t_cl

    def run(
        self,
        scans: list,
        images: list,
        scan_stamps: np.ndarray | None = None,
        image_stamps: np.ndarray | None = None,
    ) -> CamLidarResult:
        n = len(scans)
        if scan_stamps is None:
            scan_stamps = np.arange(n, dtype=np.float64) * 0.1
        if image_stamps is None:
            image_stamps = np.arange(len(images), dtype=np.float64) * 0.1
        pairing = match_nearest(scan_stamps, image_stamps)

        lidar_poses = []
        visual_poses = []
        pose_c = se3.identity_pose()
        cam_capacity = self.cfg.visual.depth_cloud_cap
        for k in range(n):
            raw = np.asarray(scans[k])[:, :3]
            xyz, mask = pc.pad_points(raw, self.capacity)

            # lidar path
            reg = sr.register_scan(
                jnp.asarray(xyz), jnp.asarray(mask), self.cfg.lidar
            )
            pose_l, _ = self.odom.process(reg.features)
            lidar_poses.append(pose_l)

            # visual path (only when an image is matched, CamLidarProcess
            # drops unmatched clouds)
            img_idx = pairing[k]
            if img_idx >= 0:
                cam_pts = self._cloud_to_camera(raw)
                sel = cam_pts[:, 2] > 0.3
                cam_pts = cam_pts[sel][: cam_capacity]
                cxyz, cmask = pc.pad_points(cam_pts, cam_capacity)
                pose_c = self.vo.process(
                    jnp.asarray(np.asarray(images[img_idx], np.float32)),
                    jnp.asarray(cxyz),
                    jnp.asarray(cmask),
                )
            # T_w_lidar = T_w_cam ∘ T_cam_lidar, in the camera-world frame
            visual_poses.append(
                se3.se3_compose(
                    se3.se3_compose(self.T_lidar_cam, pose_c),
                    self.T_cam_lidar,
                )
            )

        return CamLidarResult(
            lidar_positions=np.stack([np.asarray(p.t) for p in lidar_poses]),
            visual_positions=np.stack([np.asarray(p.t) for p in visual_poses]),
            lidar_quats=np.stack([np.asarray(p.q) for p in lidar_poses]),
            visual_quats=np.stack([np.asarray(p.q) for p in visual_poses]),
        )
