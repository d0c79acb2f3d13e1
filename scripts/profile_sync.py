"""Careful sync-aware profiling of the chunked odometry path on axon TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc
from lidar_visual_odometry_tpu.utils.config import SystemConfig

CAP = 131072


def main():
    cfg = SystemConfig()
    data = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scans.npz"))
    scans = [data[f"s{k}"] for k in range(9)]

    stacked = np.zeros((8, CAP, 3), np.float32)
    masks = np.zeros((8, CAP), bool)
    for i in range(8):
        stacked[i], masks[i] = pc.pad_points(np.asarray(scans[i + 1])[:, :3], CAP)

    xyz0, mask0 = pc.pad_points(np.asarray(scans[0])[:, :3], CAP)
    dx, dm = jnp.asarray(xyz0), jnp.asarray(mask0)
    reg0 = sr.register_scan(dx, dm, cfg.lidar)
    state = lo.init_state(reg0.features)
    jax.block_until_ready(state)

    dstk, dmsk = jnp.asarray(stacked), jnp.asarray(masks)
    jax.block_until_ready((dstk, dmsk))

    # warm compile
    st, poses = lo.odometry_chunk(state, dstk, dmsk, cfg.lidar, cfg.odometry)
    _ = np.asarray(poses.t)

    # --- single fully-synchronous chunk call, forced D2H ---
    for trial in range(3):
        t0 = time.time()
        st, poses = lo.odometry_chunk(state, dstk, dmsk, cfg.lidar, cfg.odometry)
        t1 = time.time()
        tnp = np.asarray(poses.t)
        t2 = time.time()
        print(f"chunk dispatch {1e3*(t1-t0):7.1f} ms   D2H+exec wait {1e3*(t2-t1):7.1f} ms   total {1e3*(t2-t0):7.1f} ms")

    # --- breakdown of run_chunked phases ---
    t0 = time.time()
    xyz0b, mask0b = pc.pad_points(np.asarray(scans[0])[:, :3], CAP)
    t1 = time.time()
    reg0b = sr.register_scan(jnp.asarray(xyz0b), jnp.asarray(mask0b), cfg.lidar)
    state_b = lo.init_state(reg0b.features)
    jax.block_until_ready(state_b.prev_less_flat.xyz)
    t2 = time.time()
    stacked2 = np.zeros((8, CAP, 3), np.float32)
    masks2 = np.zeros((8, CAP), bool)
    for i in range(8):
        stacked2[i], masks2[i] = pc.pad_points(np.asarray(scans[i + 1])[:, :3], CAP)
    t3 = time.time()
    d1, d2 = jnp.asarray(stacked2), jnp.asarray(masks2)
    t4 = time.time()
    stc, posesc = lo.odometry_chunk(state_b, d1, d2, cfg.lidar, cfg.odometry)
    t5 = time.time()
    out = np.asarray(posesc.t)
    t6 = time.time()
    print(f"pad frame0      {1e3*(t1-t0):7.1f} ms")
    print(f"register0+block {1e3*(t2-t1):7.1f} ms")
    print(f"pad chunk       {1e3*(t3-t2):7.1f} ms")
    print(f"H2D asarray     {1e3*(t4-t3):7.1f} ms")
    print(f"chunk dispatch  {1e3*(t5-t4):7.1f} ms")
    print(f"wait+D2H        {1e3*(t6-t5):7.1f} ms")

    # is a second fresh OdometryPipeline recompiling? trace cache info
    print("odometry_chunk cache size:", lo.odometry_chunk._cache_size())


if __name__ == "__main__":
    main()
