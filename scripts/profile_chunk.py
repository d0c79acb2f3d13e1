"""Profile the odometry hot path on the real TPU: where does per-frame time go?

Measures (pipelined, block once at the end of each measurement loop):
  1. H2D transfer of one 8-frame chunk
  2. register_scan alone (per frame)
  3. scan_to_scan alone (per frame)
  4. odometry_chunk (8 frames fused)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc
from lidar_visual_odometry_tpu.utils.config import SystemConfig

CAP = 131072


def timed(label, fn, n=5):
    fn()  # warm
    jax.effects_barrier()
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    cfg = SystemConfig()
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scans.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        scans = [data[f"s{k}"] for k in range(9)]
    else:
        seq = synthetic.SyntheticSequence(n_frames=9, width=1800, speed=1.0, yaw_rate=0.004, noise=0.01)
        scans = [seq.scan(k) for k in range(9)]

    stacked = np.zeros((8, CAP, 3), np.float32)
    masks = np.zeros((8, CAP), bool)
    for i in range(8):
        stacked[i], masks[i] = pc.pad_points(np.asarray(scans[i + 1])[:, :3], CAP)

    print(f"device: {jax.devices()[0]}")

    # 1. H2D
    timed("H2D 8-frame chunk (13 MB)", lambda: (jnp.asarray(stacked), jnp.asarray(masks)))

    # 2. register_scan standalone
    xyz0, mask0 = pc.pad_points(np.asarray(scans[0])[:, :3], CAP)
    dx, dm = jnp.asarray(xyz0), jnp.asarray(mask0)
    timed("register_scan (1 frame)", lambda: sr.register_scan(dx, dm, cfg.lidar), n=20)

    # 3. scan_to_scan standalone
    reg0 = sr.register_scan(dx, dm, cfg.lidar)
    xyz1, mask1 = pc.pad_points(np.asarray(scans[1])[:, :3], CAP)
    reg1 = sr.register_scan(jnp.asarray(xyz1), jnp.asarray(mask1), cfg.lidar)
    from lidar_visual_odometry_tpu.ops import se3
    ident = se3.identity_pose()
    timed(
        "scan_to_scan (1 frame)",
        lambda: lo.scan_to_scan(
            reg1.features, reg0.features.less_sharp, reg0.features.less_flat,
            ident, cfg.odometry,
        ),
        n=20,
    )

    # 4. fused chunk
    state = lo.init_state(reg0.features)
    dstk, dmsk = jnp.asarray(stacked), jnp.asarray(masks)

    def chunk():
        st, poses = lo.odometry_chunk(state, dstk, dmsk, cfg.lidar, cfg.odometry)
        return poses
    dt = timed("odometry_chunk (8 frames)", chunk, n=5)
    print(f"{'  -> per frame':40s} {dt/8*1e3:8.2f} ms")

    # 5. end-to-end chunked incl. host pad + H2D
    from lidar_visual_odometry_tpu.models.pipeline import OdometryPipeline
    pipe = OdometryPipeline(cfg)
    pipe.run_chunked(scans, chunk=8)
    pipe = OdometryPipeline(cfg)
    t0 = time.time()
    pipe.run_chunked(scans, chunk=8)
    print(f"{'pipeline.run_chunked 8 frames e2e':40s} {(time.time()-t0)/8*1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
