"""Profile the visual frontend's three programs on the real TPU (forced D2H sync)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import visual_frontend as vf
from lidar_visual_odometry_tpu.ops import camera, image, lk, se3
from lidar_visual_odometry_tpu.utils.config import VisualConfig

H, W = 376, 1240
CAM = dict(fx=718.0, fy=718.0, cx=W / 2.0, cy=H / 2.0, width=W, height=H)


def timed(label, fn, sync, n=10):
    sync(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    sync(fn())
    print(f"{label:44s} {(time.time()-t0)/n*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    scene = synthetic.BoxScene.corridor(0)
    R0, t0 = synthetic.camera_from_velodyne_pose(
        synthetic.yaw_matrix(0.0), np.array([0.0, 0.0, 1.5])
    )
    R1, t1 = synthetic.camera_from_velodyne_pose(
        synthetic.yaw_matrix(0.004), np.array([0.4, 0.0, 1.5])
    )
    img0, depth0 = synthetic.render_image(scene, R0, t0, **CAM)
    img1, _ = synthetic.render_image(scene, R1, t1, **CAM)
    cam = camera.Pinhole(
        jnp.float32(CAM["fx"]), jnp.float32(CAM["fy"]),
        jnp.float32(CAM["cx"]), jnp.float32(CAM["cy"]), W, H, jnp.zeros(5),
    )
    cfg = VisualConfig()

    pyr0 = tuple(image.build_pyramid(jnp.asarray(img0), cfg.lk_levels))
    pyr1 = tuple(image.build_pyramid(jnp.asarray(img1), cfg.lk_levels))

    # depth cloud from rendered depth
    ys, xs = np.mgrid[0:H:4, 0:W:4]
    zs = depth0[ys, xs]
    okd = np.isfinite(zs) & (zs > 0.5)
    pts = np.stack(
        [(xs - CAM["cx"]) / CAM["fx"] * zs, (ys - CAM["cy"]) / CAM["fy"] * zs, zs],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    okd = okd.reshape(-1)
    N = 1 << int(np.ceil(np.log2(len(pts))))
    pts_p = np.zeros((N, 3), np.float32)
    mask_p = np.zeros((N,), bool)
    pts_p[: len(pts)] = pts
    mask_p[: len(pts)] = okd
    dc = vf.build_depth_cloud(jnp.asarray(pts_p), jnp.asarray(mask_p))

    table = vf.empty_table(cfg.max_tracked)
    table = vf._replenish_jit(table, pyr0[0], cam, se3.identity_pose(), cfg)
    print("tracked features:", int(np.asarray(table.active).sum()))

    ident = se3.identity_pose()

    def sync_any(x):
        np.asarray(jax.tree.leaves(x)[0])

    # 0. host pyramid build (device)
    timed("build_pyramid (device)", lambda: image.build_pyramid(jnp.asarray(img1), cfg.lk_levels),
          lambda p: np.asarray(p[-1][:1, :1]))
    timed("build_depth_cloud", lambda: vf.build_depth_cloud(jnp.asarray(pts_p), jnp.asarray(mask_p)),
          sync_any)

    # 1. LK tracking
    trk = lambda: lk.track_pyramid_reverse_checked(
        pyr0, pyr1, table.uv, win=cfg.lk_window, iters=cfg.lk_iters,
        levels=cfg.lk_levels, max_reverse_err=cfg.reverse_check_px)
    timed("LK track (fwd+reverse)", trk, sync_any)
    uv1, ok = trk()

    # 2. solve_and_update
    sau = lambda: vf.solve_and_update(uv1, ok, dc, table, ident, ident, cam, cfg)
    timed("solve_and_update", sau, sync_any)

    # 3. replenish
    rep = lambda: vf._replenish_jit(table, pyr1[0], cam, ident, cfg)
    timed("replenish", rep, sync_any)

    # whole step
    step = lambda: vf.visual_step(pyr0, pyr1, dc, table, ident, ident, cam, cfg)
    timed("visual_step (all 3)", step, sync_any, n=5)


if __name__ == "__main__":
    main()
