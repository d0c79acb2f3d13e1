#!/usr/bin/env python
"""Scaling-efficiency harness: distributed stages at mesh sizes 1, 2, 4, 8.

Measures the device-side throughput of the psum-reduced odometry GN, the
submap-sharded mapping step, and the points-sharded window BA as the mesh
grows. On the CPU backend (``--cpu``, 8 virtual devices) the numbers validate
*correct scaling structure* (work division + collective shapes), not absolute
speed; on a real multi-chip slice the same harness yields the frames/s scaling
efficiency targeted by BASELINE.md (≥70% at N hosts).

Usage:
    python scripts/bench_scaling.py --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="8 virtual CPU devices")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np
    import jax.numpy as jnp

    from lidar_visual_odometry_tpu.data import synthetic
    from lidar_visual_odometry_tpu.models import scan_registration as sr
    from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
    from lidar_visual_odometry_tpu.parallel import sharded_odometry as so
    from lidar_visual_odometry_tpu.utils.config import (
        LidarConfig, OdometryConfig,
    )

    seq = synthetic.SyntheticSequence(n_frames=2, width=1200, noise=0.01)
    cfg = LidarConfig(azimuth_bins=1024)
    ocfg = OdometryConfig(outer_iters=5, gn_iters=4)
    regs = []
    for k in range(2):
        xyz, mask = pc.pad_points(seq.scan(k), 131072)
        regs.append(sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg))

    devices = jax.devices()
    results = []
    n = 1
    while n <= len(devices):
        mesh = so.make_mesh(devices[:n])

        def run():
            return so.sharded_scan_to_scan(
                mesh, regs[1].features,
                regs[0].features.less_sharp, regs[0].features.less_flat,
                se3.identity_pose(), ocfg,
            )

        jax.block_until_ready(run())
        t0 = time.time()
        r = None
        for _ in range(args.reps):
            r = run()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / args.reps
        results.append({"devices": n, "odometry_ms": round(dt * 1e3, 2)})
        n *= 2

    base = results[0]["odometry_ms"]
    for r in results:
        speedup = base / r["odometry_ms"]
        r["speedup"] = round(speedup, 2)
        r["efficiency"] = round(speedup / r["devices"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
