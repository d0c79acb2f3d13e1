"""Microbench ops/pallas_lk.lk_level on the real TPU vs the eps knob.

Uses the cached bench images (level-0 640x192) with realistic warm-start
displacements, timing a pipelined run of many kernel calls (block once at
the end with a real D2H — `jax.block_until_ready` on the relay returns
without draining, CLAUDE.md).

Usage: python scripts/exp_lk_eps.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidar_visual_odometry_tpu.ops import pallas_lk
from lidar_visual_odometry_tpu.ops.image import build_pyramid


def main():
    data_i = np.load(os.path.join(os.path.dirname(__file__), "..",
                                  ".bench_images49.npz"))
    img0 = np.asarray(data_i["i10"], np.float32)
    img1 = np.asarray(data_i["i11"], np.float32)
    if img0.max() > 1.5:
        img0, img1 = img0 / 255.0, img1 / 255.0

    N = 1024
    rng = np.random.default_rng(0)
    reps = 40

    for level in (0, 1):
        p0 = build_pyramid(jnp.asarray(img0), 3)[level]
        p1 = build_pyramid(jnp.asarray(img1), 3)[level]
        H, W = p0.shape
        uv = jnp.asarray(np.stack([
            rng.uniform(15, W - 15, N), rng.uniform(15, H - 15, N)
        ], -1).astype(np.float32))
        guess = jnp.asarray(rng.normal(0, 0.5, (N, 2)).astype(np.float32))
        for eps in (0.0, 0.01, 0.03, 0.1):
            d, ok = pallas_lk.lk_level(p0, p1, uv, guess,
                                       win=13, iters=10, eps=eps)
            np.asarray(d)  # warm + drain
            t0 = time.time()
            for _ in range(reps):
                d, ok = pallas_lk.lk_level(p0, p1, uv, guess,
                                           win=13, iters=10, eps=eps)
            np.asarray(d)
            dt = (time.time() - t0) / reps * 1e3
            print(f"level={level} eps={eps:<5} {dt:6.2f} ms/call  "
                  f"ok={int(np.asarray(ok).sum())}")


if __name__ == "__main__":
    main()
