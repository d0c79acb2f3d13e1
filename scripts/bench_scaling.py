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

    from jax.sharding import NamedSharding, PartitionSpec as P

    from lidar_visual_odometry_tpu.models.lidar_mapping import LocalMap
    from lidar_visual_odometry_tpu.ops import camera
    from lidar_visual_odometry_tpu.ops.pointcloud import PointBatch
    from lidar_visual_odometry_tpu.parallel import (
        sharded_ba, sharded_mapping as sm,
    )
    from lidar_visual_odometry_tpu.utils.config import MappingConfig

    mcfg = MappingConfig(outer_iters=2, gn_iters=4)
    rng = np.random.default_rng(0)

    # window-BA fixture: 5 keyframes, dense point budget sharded by the mesh
    K, Pp, lvl = 5, 4096, 0
    cam = camera.Pinhole(
        jnp.float32(240.0), jnp.float32(240.0), jnp.float32(128.0),
        jnp.float32(64.0), 256, 128, jnp.zeros(5),
    )
    pyrs = tuple(
        jnp.asarray(rng.random((K, 128 >> l, 256 >> l)).astype(np.float32))
        for l in range(2)
    )
    ba_pts = jnp.asarray(
        np.stack([rng.uniform(-2, 2, (Pp, 3)) + [0, 0, 6] for _ in range(K)])
        .astype(np.float32)
    )
    ba_masks = jnp.ones((K, Pp), bool)
    ba_poses = se3.Pose(
        jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1)),
        jnp.asarray(rng.normal(scale=0.05, size=(K, 3)).astype(np.float32)),
    )

    def timeit(run):
        jax.block_until_ready(run())
        t0 = time.time()
        r = None
        for _ in range(args.reps):
            r = run()
        jax.block_until_ready(r)
        return (time.time() - t0) / args.reps * 1e3

    devices = jax.devices()
    results = []
    n = 1
    while n <= len(devices):
        mesh = so.make_mesh(devices[:n])
        shard = NamedSharding(mesh, P(so.DATA_AXIS))
        rep = NamedSharding(mesh, P())

        # local submap sharded along the capacity axis (frame-0 features)
        local = LocalMap(
            PointBatch(
                jax.device_put(regs[0].features.less_sharp.xyz, shard),
                jax.device_put(regs[0].features.less_sharp.mask, shard),
            ),
            PointBatch(
                jax.device_put(regs[0].features.less_flat.xyz, shard),
                jax.device_put(regs[0].features.less_flat.mask, shard),
            ),
        )
        f1 = regs[1].features

        row = {"devices": n}
        row["odometry_ms"] = round(timeit(lambda: so.sharded_scan_to_scan(
            mesh, f1,
            regs[0].features.less_sharp, regs[0].features.less_flat,
            se3.identity_pose(), ocfg,
        )), 2)
        row["mapping_ms"] = round(timeit(lambda: sm.sharded_mapping_step(
            mesh, f1.less_sharp.xyz, f1.less_sharp.mask,
            f1.less_flat.xyz, f1.less_flat.mask,
            local, se3.identity_pose(), mcfg,
        )), 2)
        row["ba_ms"] = round(timeit(lambda: sharded_ba.sharded_refine(
            mesh, pyrs,
            jax.device_put(ba_pts, NamedSharding(mesh, P(None, so.DATA_AXIS))),
            ba_masks, ba_poses, cam, n_iters=4, level=lvl,
        )), 2)
        # WEAK scaling for BA: points grow with the mesh (P = 4096·D). On
        # shared host cores strong scaling of a small fixed problem mostly
        # measures partition overhead + thread contention; flat wall under
        # proportional work isolates the collective/overhead cost — the
        # signal that transfers to real ICI (BASELINE.md explanation of the
        # BA column)
        ba_pts_w = jnp.asarray(
            np.stack([
                rng.uniform(-2, 2, (Pp * n, 3)) + [0, 0, 6]
                for _ in range(K)
            ]).astype(np.float32)
        )
        ba_masks_w = jnp.ones((K, Pp * n), bool)
        row["ba_weak_ms"] = round(timeit(lambda: sharded_ba.sharded_refine(
            mesh, pyrs,
            jax.device_put(
                ba_pts_w, NamedSharding(mesh, P(None, so.DATA_AXIS))
            ),
            ba_masks_w, ba_poses, cam, n_iters=4, level=lvl,
        )), 2)
        results.append(row)
        n *= 2

    for key in ("odometry_ms", "mapping_ms", "ba_ms"):
        base = results[0][key]
        for r in results:
            sp = base / r[key]
            r[key.replace("_ms", "_eff")] = round(sp / r["devices"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
