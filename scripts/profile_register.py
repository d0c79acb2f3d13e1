"""Sub-stage timing of register_scan + scan_to_scan internals on TPU."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import features as F
from lidar_visual_odometry_tpu.ops import pointcloud as pc
from lidar_visual_odometry_tpu.utils.config import SystemConfig

CAP = 131072


def timed(label, fn, sync, n=10):
    sync(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    out = fn()
    sync(out)
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def sync_tree(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf)[:1] if leaf.ndim else np.asarray(leaf)


def main():
    cfg = SystemConfig()
    lc = cfg.lidar
    data = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scans.npz"))
    scan = data["s1"]
    xyz, mask = pc.pad_points(scan[:, :3], CAP)
    dx, dm = jnp.asarray(xyz), jnp.asarray(mask)

    bri = jax.jit(partial(
        pc.build_range_image, n_scans=lc.n_scans, width=lc.azimuth_bins,
        min_range=lc.min_range, max_range=lc.max_range,
    ))
    timed("build_range_image", lambda: bri(dx, dm), sync_tree)
    ri = bri(dx, dm)

    cr = jax.jit(pc.compact_rings)
    timed("compact_rings", lambda: cr(ri), sync_tree)
    cs = cr(ri)

    ef = jax.jit(partial(
        F.extract_features,
        n_sectors=lc.n_sectors, max_sharp=lc.max_sharp_per_sector,
        max_less_sharp=lc.max_less_sharp_per_sector,
        max_flat=lc.max_flat_per_sector, edge_gate=lc.curvature_edge_min,
        surf_gate=lc.curvature_surf_max, surf_leaf=lc.surf_leaf_size,
        max_less_flat_per_ring=lc.max_less_flat // lc.n_scans,
    ))
    timed("extract_features (all)", lambda: ef(cs), sync_tree)

    # curvature + reach only
    cur = jax.jit(lambda c: F.curvature(c)[0])
    timed("  curvature stencil", lambda: cur(cs), lambda x: np.asarray(x[:1]))

    # voxel downsample of less-flat alone (vmapped per ring)
    R, W = cs.valid.shape
    vd = jax.jit(jax.vmap(lambda p, m: pc.voxel_downsample(
        p, m, leaf=lc.surf_leaf_size, max_out=lc.max_less_flat // lc.n_scans)))
    timed("  less-flat voxel_downsample (64 rings)", lambda: vd(cs.xyz, cs.valid), sync_tree)

    # --- scan_to_scan internals ---
    from lidar_visual_odometry_tpu.models import lidar_odometry as lo
    from lidar_visual_odometry_tpu.ops import knn, lidar_factors as lf, pallas_gn, se3

    reg0 = sr.register_scan(jnp.asarray(*[jnp.asarray(v) for v in [pc.pad_points(data["s0"][:, :3], CAP)[0]]][:1]), jnp.asarray(pc.pad_points(data["s0"][:, :3], CAP)[1]), lc)
    reg1 = sr.register_scan(dx, dm, lc)
    f1, f0 = reg1.features, reg0.features
    oc = cfg.odometry
    Rr = oc.n_rings
    ls_blocks = f0.less_sharp.xyz.reshape(Rr, -1, 3)
    ls_mask = f0.less_sharp.mask.reshape(Rr, -1)
    lfb = f0.less_flat.xyz.reshape(Rr, -1, 3)
    lf_mask = f0.less_flat.mask.reshape(Rr, -1)

    ae = jax.jit(partial(knn.associate_edges_coords,
                         dist_sq_threshold=oc.dist_sq_threshold, nearby_scan=oc.nearby_scan))
    ap = jax.jit(partial(knn.associate_planes_coords,
                         dist_sq_threshold=oc.dist_sq_threshold, nearby_scan=oc.nearby_scan))
    timed("assoc edges (1 call)", lambda: ae(f1.sharp.xyz, f1.sharp.mask, ls_blocks, ls_mask), sync_tree)
    timed("assoc planes (1 call)", lambda: ap(f1.flat.xyz, f1.flat.mask, lfb, lf_mask), sync_tree)

    ea = ae(f1.sharp.xyz, f1.sharp.mask, ls_blocks, ls_mask)
    pa = ap(f1.flat.xyz, f1.flat.mask, lfb, lf_mask)
    ew = ea.valid.astype(jnp.float32)[None]
    pw = pa.valid.astype(jnp.float32)[None]
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0_ = jnp.zeros(3, jnp.float32)
    s1 = jnp.ones_like(f1.sharp.rel_time)

    gi = lambda: pallas_gn.gn_inner_loop(
        q0, t0_, f1.sharp.xyz.T, ea.a.T, ea.b.T, ew,
        f1.flat.xyz.T, pa.j.T, pa.l.T, pa.m.T, pw,
        n_iters=oc.gn_iters, huber_delta=oc.huber_delta)
    timed("gn_inner_loop (1 call, 4 iters)", gi, lambda x: np.asarray(x[0]))


if __name__ == "__main__":
    main()
