"""Per-stage device timing with forced D2H sync (axon block_until_ready is unreliable)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.utils.config import SystemConfig

CAP = 131072


def timed(label, fn, sync, n=10):
    fn()
    sync(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    out = fn()
    sync(out)
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def main():
    cfg = SystemConfig()
    data = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scans.npz"))
    scans = [data[f"s{k}"] for k in range(9)]

    xyz0, mask0 = pc.pad_points(scans[0][:, :3], CAP)
    xyz1, mask1 = pc.pad_points(scans[1][:, :3], CAP)
    dx0, dm0 = jnp.asarray(xyz0), jnp.asarray(mask0)
    dx1, dm1 = jnp.asarray(xyz1), jnp.asarray(mask1)

    # register_scan: sync via features tensor D2H (small slice)
    def sync_reg(reg):
        np.asarray(reg.features.sharp.xyz[:1])

    timed("register_scan", lambda: sr.register_scan(dx1, dm1, cfg.lidar), sync_reg)

    reg0 = sr.register_scan(dx0, dm0, cfg.lidar)
    reg1 = sr.register_scan(dx1, dm1, cfg.lidar)
    ident = se3.identity_pose()

    def sync_pose(p):
        np.asarray(p.t)

    timed(
        "scan_to_scan (10 outer x 4 gn)",
        lambda: lo.scan_to_scan(
            reg1.features, reg0.features.less_sharp, reg0.features.less_flat,
            ident, cfg.odometry,
        ),
        sync_pose,
    )

    # single odometry_step jitted alone (register+odom, 1 frame)
    from functools import partial

    @partial(jax.jit, static_argnames=("lc", "oc"))
    def one_frame(state, scan, mask, lc, oc):
        feats = sr.register_scan_impl(scan, mask, lc).features
        return lo.odometry_step(state, feats, oc)

    state = lo.init_state(reg0.features)
    timed(
        "one_frame fused (register+odom)",
        lambda: one_frame(state, dx1, dm1, cfg.lidar, cfg.odometry)[1],
        sync_pose,
    )

    # chunk sizes
    for K in (8,):
        stacked = np.zeros((K, CAP, 3), np.float32)
        masks = np.zeros((K, CAP), bool)
        for i in range(K):
            stacked[i], masks[i] = pc.pad_points(scans[(i % 8) + 1][:, :3], CAP)
        d1, d2 = jnp.asarray(stacked), jnp.asarray(masks)
        dt = timed(
            f"odometry_chunk K={K}",
            lambda: lo.odometry_chunk(state, d1, d2, cfg.lidar, cfg.odometry)[1],
            sync_pose,
            n=5,
        )
        print(f"{'  -> per frame':44s} {dt/K*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
