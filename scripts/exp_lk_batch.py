"""Hardware A/B of the LK kernel's loop structure: per-feature vs batch8.

The per-feature kernel runs one ``while_loop`` per feature — a control-flow
barrier Mosaic cannot interleave across (measured: engine swap and fori
unrolling both change nothing). ``batch8=True`` restructures to ONE shared
while_loop whose body carries all 8 features' iterations as independent
straight-line chains (masked per-feature convergence). This script
validates parity on the known-shift fixture ON HARDWARE (CLAUDE.md: always
validate new Pallas paths on the chip) and times both at bench shapes.

Usage: python scripts/exp_lk_batch.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    N = 768
    rng = np.random.default_rng(0)
    reps = 40

    # ---- hardware known-answer + cross-structure parity ----
    sh0 = jnp.asarray(img0[:-2, :-3])
    sh1 = jnp.asarray(img0[2:, 3:])       # true displacement (-3, -2)
    H, W = sh0.shape
    uv = jnp.asarray(np.stack([
        rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)
    ], -1).astype(np.float32))
    zero = jnp.zeros((N, 2), jnp.float32)
    for affine in (False, True):
        d_ref, ok_ref = pallas_lk.lk_level(
            sh0, sh1, uv, zero, win=13, iters=30, affine=affine
        )
        d_b8, ok_b8 = pallas_lk.lk_level(
            sh0, sh1, uv, zero, win=13, iters=30, affine=affine, batch8=True
        )
        okm = np.asarray(ok_ref)
        assert (okm == np.asarray(ok_b8)).all()
        diff = np.abs(np.asarray(d_ref) - np.asarray(d_b8))[okm].max()
        err = np.abs(np.asarray(d_b8)[okm] - np.array([-3.0, -2.0],
                                                      np.float32))
        med = float(np.median(err.max(axis=1)))
        print(f"affine={affine}: b8-vs-ref max diff {diff:.5f} px, "
              f"known-shift median err {med:.5f} px")
        assert diff < 1e-3 and med < 0.05, "HARDWARE mismatch"

    # ---- timing at bench shapes ----
    for level in (0, 1):
        p0 = build_pyramid(jnp.asarray(img0), 3)[level]
        p1 = build_pyramid(jnp.asarray(img1), 3)[level]
        Hl, Wl = p0.shape
        uv = jnp.asarray(np.stack([
            rng.uniform(15, Wl - 15, N), rng.uniform(15, Hl - 15, N)
        ], -1).astype(np.float32))
        guess = jnp.asarray(rng.normal(0, 0.5, (N, 2)).astype(np.float32))
        for affine in (False, True):
            for batch8 in (False, True):
                d, ok = pallas_lk.lk_level(
                    p0, p1, uv, guess, win=13, iters=10, eps=0.01,
                    affine=affine, batch8=batch8,
                )
                np.asarray(d)
                t0 = time.time()
                for _ in range(reps):
                    d, ok = pallas_lk.lk_level(
                        p0, p1, uv, guess, win=13, iters=10, eps=0.01,
                        affine=affine, batch8=batch8,
                    )
                np.asarray(d)
                dt = (time.time() - t0) / reps * 1e3
                print(f"level={level} affine={affine} batch8={batch8}: "
                      f"{dt:6.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
