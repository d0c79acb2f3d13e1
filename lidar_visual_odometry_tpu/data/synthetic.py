"""Synthetic HDL-64 scene raycaster (host-side, numpy).

Generates structured lidar scans — ground plane + box "buildings" + thin poles,
so curvature-based corner/plane features exist — with exact ground-truth sensor
poses. This replaces KITTI for tests and benchmarks in the zero-egress
environment (no dataset on disk), standing in for the reference's kittiHelper
data path (``src/kittiHelper.cpp:37-181``).

Frames follow Velodyne convention: x forward, y left, z up; azimuth sweep
matches the reference's clockwise ``ori = -atan2(y, x)`` time ordering
(``scanRegistration.cpp:141``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def hdl64_elevations() -> np.ndarray:
    """Per-ring elevation angles (deg) consistent with the reference's HDL-64
    ring formula (``scanRegistration.cpp:184-199``): rings 0-31 span
    [2°, -8.33°] at 1/3° spacing, rings 32-63 span [-8.83°, -24.33°] at 1/2°."""
    upper = 2.0 - np.arange(32) / 3.0
    lower = -8.83 - (np.arange(32, 64) - 32) / 2.0
    return np.concatenate([upper, lower])


@dataclass
class BoxScene:
    """Axis-aligned boxes + ground plane z=0."""

    boxes: np.ndarray  # (B, 2, 3): [min_corner, max_corner]
    ground_z: float = 0.0

    @staticmethod
    def corridor(seed: int = 0, length: float = 200.0) -> "BoxScene":
        """An urban-canyon corridor along +x: building slabs on both sides with
        gaps (→ vertical edges), plus poles and cross walls."""
        rng = np.random.default_rng(seed)
        boxes = []
        for side in (-1.0, 1.0):
            x = -20.0
            while x < length:
                w = rng.uniform(8.0, 20.0)       # building length along x
                gap = rng.uniform(2.0, 6.0)      # gap → corner edges
                depth = rng.uniform(5.0, 10.0)
                dist = rng.uniform(8.0, 14.0)    # lateral offset of facade
                h = rng.uniform(4.0, 12.0)
                y0 = side * dist
                y1 = side * (dist + depth)
                boxes.append([[x, min(y0, y1), 0.0], [x + w, max(y0, y1), h]])
                x += w + gap
        # poles near the road
        for _ in range(30):
            px = rng.uniform(-10.0, length)
            py = rng.uniform(-7.0, 7.0)
            boxes.append([[px, py, 0.0], [px + 0.25, py + 0.25, rng.uniform(2, 5)]])
        return BoxScene(np.asarray(boxes, dtype=np.float64))


def _ray_aabb(origin: np.ndarray, dirs: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Min positive hit distance per ray against a box set (slab method).

    origin (3,), dirs (M, 3) unit, boxes (B, 2, 3) → (M,) t or +inf.
    """
    inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)  # (M, 3)
    lo = boxes[:, 0][:, None, :]  # (B, 1, 3)
    hi = boxes[:, 1][:, None, :]
    t0 = (lo - origin) * inv[None]  # (B, M, 3)
    t1 = (hi - origin) * inv[None]
    tmin = np.minimum(t0, t1).max(axis=-1)  # (B, M)
    tmax = np.maximum(t0, t1).min(axis=-1)
    hit = (tmax >= tmin) & (tmax > 0)
    t = np.where(hit, np.where(tmin > 0, tmin, np.inf), np.inf)
    return t.min(axis=0)


def render_scan(
    scene: BoxScene,
    R_ws: np.ndarray,
    t_ws: np.ndarray,
    *,
    width: int = 1800,
    max_range: float = 80.0,
    noise: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Render one scan from sensor pose (R_ws, t_ws) (sensor→world).

    Returns (N, 3) float32 points in the sensor frame, azimuth-major scan
    order (like a raw Velodyne packet stream); misses are dropped.
    """
    elev = np.radians(hdl64_elevations())  # (64,)
    az = -np.pi + (np.arange(width) + 0.5) / width * 2.0 * np.pi  # (W,)
    # scan order: azimuth outer loop (time), rings inner
    ce, se = np.cos(elev), np.sin(elev)
    ca, sa = np.cos(az), np.sin(az)
    # -atan2(y, x) == az  →  x = cos(e)cos(az), y = -cos(e)sin(az)
    dirs_s = np.stack(
        [
            np.outer(ca, ce),        # (W, 64)
            np.outer(-sa, ce),
            np.broadcast_to(se, (width, 64)),
        ],
        axis=-1,
    ).reshape(-1, 3)  # (W*64, 3), azimuth-major
    dirs_w = dirs_s @ R_ws.T

    t_box = _ray_aabb(t_ws, dirs_w, scene.boxes)
    # ground plane z = ground_z
    dz = dirs_w[:, 2]
    down = dz < -1e-9
    t_gnd = np.where(down, (scene.ground_z - t_ws[2]) / np.where(down, dz, -1.0), np.inf)
    t = np.minimum(t_box, t_gnd)
    hit = np.isfinite(t) & (t < max_range) & (t > 0.5)

    pts_w = t_ws + dirs_w[hit] * t[hit, None]
    if noise > 0:
        rng = np.random.default_rng(seed)
        pts_w = pts_w + rng.normal(scale=noise, size=pts_w.shape)
    pts_s = (pts_w - t_ws) @ R_ws
    return pts_s.astype(np.float32)


def render_image(
    scene: BoxScene,
    R_wc: np.ndarray,
    t_wc: np.ndarray,
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    max_range: float = 120.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a textured grayscale view + depth map from a camera pose.

    Camera convention: z forward, x right, y down (standard pinhole). The
    texture is procedural (world-position sinusoids + height shading), so
    images of the same scene are exactly photo-consistent across views —
    ideal ground truth for KLT / photometric-tracking tests.

    Returns (image (H, W) float32 in [0,1], depth (H, W) float32, inf = miss).
    """
    ys, xs = np.mgrid[0:height, 0:width]
    dirs_c = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, dtype=np.float64)],
        axis=-1,
    ).reshape(-1, 3)
    dirs_c /= np.linalg.norm(dirs_c, axis=-1, keepdims=True)
    dirs_w = dirs_c @ R_wc.T

    t_box = _ray_aabb(t_wc, dirs_w, scene.boxes)
    dz = dirs_w[:, 2]
    down = dz < -1e-9
    t_gnd = np.where(down, (scene.ground_z - t_wc[2]) / np.where(down, dz, -1.0), np.inf)
    t = np.minimum(t_box, t_gnd)
    hit = np.isfinite(t) & (t < max_range)

    pts = t_wc + dirs_w * np.where(hit, t, 1.0)[:, None]
    # procedural world-anchored texture
    tex = (
        0.5
        + 0.2 * np.sin(2.1 * pts[:, 0]) * np.cos(1.7 * pts[:, 1])
        + 0.15 * np.sin(3.3 * pts[:, 2] + 0.8 * pts[:, 0])
        + 0.1 * np.sin(9.0 * pts[:, 0] + 7.0 * pts[:, 1])
    )
    shade = 1.0 / (1.0 + 0.01 * np.where(hit, t, max_range))
    img = np.where(hit, np.clip(tex, 0.05, 0.95) * shade, 0.02)
    depth_ray = np.where(hit, t, np.inf)
    # depth map stores z-depth (camera frame), the pinhole convention
    z_cam = (pts - t_wc) @ R_wc  # camera-frame points
    depth = np.where(hit, z_cam[:, 2], np.inf)
    return (
        img.reshape(height, width).astype(np.float32),
        depth.reshape(height, width).astype(np.float32),
    )


def camera_from_velodyne_pose(R_ws: np.ndarray, t_ws: np.ndarray):
    """Camera pose for a forward-looking camera rigidly on the sensor:
    cam z = velo x (forward), cam x = −velo y (right), cam y = −velo z (down)."""
    # columns: cam x=(0,−1,0), cam y=(0,0,−1), cam z=(1,0,0) in the velo frame
    R_sc = np.array(
        [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]
    )
    return R_ws @ R_sc, t_ws


def yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@dataclass
class SyntheticSequence:
    """A drive through a corridor scene with exact GT poses."""

    n_frames: int = 20
    speed: float = 1.0          # m/frame
    yaw_rate: float = 0.005     # rad/frame
    width: int = 1800
    noise: float = 0.0
    seed: int = 0
    scene: BoxScene = field(default_factory=lambda: BoxScene.corridor(0))

    def pose(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """GT sensor→world pose at frame k (arc of constant curvature)."""
        yaw = self.yaw_rate * k
        R = yaw_matrix(yaw)
        if abs(self.yaw_rate) < 1e-9:
            t = np.array([self.speed * k, 0.0, 0.0])
        else:
            rad = self.speed / self.yaw_rate
            t = np.array([rad * np.sin(yaw), rad * (1.0 - np.cos(yaw)), 0.0])
        t = t + np.array([0.0, 0.0, 1.73])  # sensor height
        return R, t

    def scan(self, k: int) -> np.ndarray:
        R, t = self.pose(k)
        return render_scan(
            self.scene, R, t,
            width=self.width, noise=self.noise, seed=self.seed + k,
        )

    def gt_relative(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """GT motion from frame k to k+1 expressed in frame k:
        T_k_{k+1} = T_w_k^{-1} T_w_{k+1} → (R_rel, t_rel)."""
        R0, t0 = self.pose(k)
        R1, t1 = self.pose(k + 1)
        return R0.T @ R1, R0.T @ (t1 - t0)
