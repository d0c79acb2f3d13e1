"""Profile the device-resident mapping stage on the real TPU.

Times (with a real D2H drain per measurement — axon's block_until_ready
returns early): voxel_downsample, the 5-NN association, solve_map_pose,
the full device_mapping_step, and the fused slam_chunk per frame.
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

from lidar_visual_odometry_tpu.models import device_mapping as dm
from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.models.lidar_mapping import solve_map_pose
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.ops.pointcloud import PointBatch, voxel_downsample
from lidar_visual_odometry_tpu.utils.config import SystemConfig

CAP = 131072


def timed(label, fn, n=10):
    out = fn()  # warm/compile
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.tree.map(lambda x: np.asarray(x), out)  # real drain
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    cfg = SystemConfig()
    mcfg = cfg.mapping
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_scans.npz",
    )
    data = np.load(cache)
    scans = [data[f"s{k}"] for k in range(9)]
    print(f"device: {jax.devices()[0]}  mapping cfg: "
          f"caps=({mcfg.map_corner_cap},{mcfg.map_surf_cap}) "
          f"slots=({mcfg.corner_slot},{mcfg.surf_slot}) "
          f"outer={mcfg.outer_iters}", flush=True)

    xyz0, mask0 = pc.pad_points(np.asarray(scans[0])[:, :3], CAP)
    reg0 = sr.register_scan(jnp.asarray(xyz0), jnp.asarray(mask0), cfg.lidar)
    feats = reg0.features
    ident = se3.identity_pose()

    # 1. voxel downsample (both classes)
    vdj = jax.jit(lambda x, m: voxel_downsample(
        x, m, leaf=mcfg.corner_leaf, max_out=mcfg.corner_slot))
    timed("voxel_downsample corner (24576 pts)",
          lambda: vdj(feats.less_sharp.xyz, feats.less_sharp.mask))
    vdj2 = jax.jit(lambda x, m: voxel_downsample(
        x, m, leaf=mcfg.surf_leaf, max_out=mcfg.surf_slot))
    timed("voxel_downsample surf (32768 pts)",
          lambda: vdj2(feats.less_flat.xyz, feats.less_flat.mask))

    # seed a full map state by running F frames
    state = dm.init_state(mcfg)
    for k in range(8):
        xyz, mask = pc.pad_points(np.asarray(scans[k])[:, :3], CAP)
        reg = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg.lidar)
        state, _ = dm.device_mapping_step(
            state, reg.features.less_sharp.xyz, reg.features.less_sharp.mask,
            reg.features.less_flat.xyz, reg.features.less_flat.mask,
            ident, mcfg,
        )

    corner_q = vdj(feats.less_sharp.xyz, feats.less_sharp.mask)
    surf_q = vdj2(feats.less_flat.xyz, feats.less_flat.mask)
    corner_cand = PointBatch(state.corner, state.corner_mask)
    surf_cand = PointBatch(state.surf, state.surf_mask)

    # 2. the NN kernels alone
    if jax.default_backend() == "tpu":
        from lidar_visual_odometry_tpu.ops import pallas_nn

        cb = pallas_nn.bake_mask(corner_cand.xyz, corner_cand.mask)
        sb = pallas_nn.bake_mask(surf_cand.xyz, surf_cand.mask)
        timed(f"NN corner idx ({mcfg.corner_slot}x{cb.shape[0]})",
              lambda: pallas_nn.block_topk(
                  corner_q.xyz, cb, k=mcfg.knn, q_tile=1024))
        timed(f"NN surf idx ({mcfg.surf_slot}x{sb.shape[0]})",
              lambda: pallas_nn.block_topk(
                  surf_q.xyz, sb, k=mcfg.knn, q_tile=1024))
        @jax.jit
        def nn_gather(qx, cand):
            d, idx = pallas_nn.block_topk(qx, cand, k=mcfg.knn, q_tile=1024)
            return d, cand[idx]

        timed("NN surf idx+gather (fused)",
              lambda: nn_gather(surf_q.xyz, sb))

    # 3. full solve
    smp = jax.jit(lambda cq, sq, cc, sc, p: solve_map_pose(
        cq, sq, cc, sc, p, mcfg))
    timed("solve_map_pose (2 outer x [NN+fits+4 GN])",
          lambda: smp(corner_q, surf_q, corner_cand, surf_cand, ident))

    # 4. one full mapping step
    timed("device_mapping_step (ds+solve+insert)",
          lambda: dm.device_mapping_step(
              state, feats.less_sharp.xyz, feats.less_sharp.mask,
              feats.less_flat.xyz, feats.less_flat.mask, ident, mcfg)[1])

    # 5. fused slam chunk
    qs = np.empty((8, CAP, 3), np.uint16)
    counts = np.empty((8,), np.int32)
    for i in range(8):
        qs[i], counts[i] = lo.quantize_scan(np.asarray(scans[i + 1]), CAP)
    dq, dc = jnp.asarray(qs), jnp.asarray(counts)
    odo_state = lo.init_state(feats)

    def chunk():
        _, _, op, mp = dm.slam_chunk_quantized(
            odo_state, state, dq, dc, cfg.lidar, cfg.odometry, mcfg)
        return mp
    dt = timed("slam_chunk_quantized (8 frames)", chunk, n=5)
    print(f"{'  -> per frame':44s} {dt/8*1e3:8.2f} ms", flush=True)

    def ochunk():
        _, poses = lo.odometry_chunk_quantized(
            odo_state, dq, dc, cfg.lidar, cfg.odometry)
        return poses
    dt = timed("odometry_chunk_quantized (8 frames)", ochunk, n=5)
    print(f"{'  -> per frame':44s} {dt/8*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
