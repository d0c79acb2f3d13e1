"""Hardware sweep of the LK batch8 kernel's feature-block size ``fb``.

BASELINE's roofline notes the affine batch8 body gains only 8% over the
per-feature loop because its per-feature scalar chain (6 patch sums + two
triangular solves) is long enough that register pressure limits
cross-feature overlap at fb=8. This sweeps fb in {8, 16, 32} (SMEM block
first dims must stay multiples of 8 — CLAUDE.md Mosaic constraint) for
both solve modes at the bench shape, with cross-fb parity asserted on the
hardware known-shift fixture first.

Usage: python scripts/exp_lk_fb.py
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
    FBS = (8, 16, 32)

    # ---- hardware known-answer + cross-fb parity ----
    sh0 = jnp.asarray(img0[:-2, :-3])
    sh1 = jnp.asarray(img0[2:, 3:])       # true displacement (-3, -2)
    H, W = sh0.shape
    uv = jnp.asarray(np.stack([
        rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)
    ], -1).astype(np.float32))
    zero = jnp.zeros((N, 2), jnp.float32)
    for affine in (False, True):
        d_ref, ok_ref = pallas_lk.lk_level(
            sh0, sh1, uv, zero, win=13, iters=30, affine=affine,
            batch8=True, fb=8,
        )
        okm = np.asarray(ok_ref)
        for fb in FBS[1:]:
            d, ok = pallas_lk.lk_level(
                sh0, sh1, uv, zero, win=13, iters=30, affine=affine,
                batch8=True, fb=fb,
            )
            assert (okm == np.asarray(ok)).all(), (affine, fb)
            diff = np.abs(np.asarray(d_ref) - np.asarray(d))[okm].max()
            print(f"affine={affine} fb={fb}: vs fb=8 max diff {diff:.5f} px")
            # NOTE: fb changes the shared-loop convergence grouping (the
            # loop runs to the last unconverged feature of the BLOCK), so
            # eps>0 results may differ slightly; at eps=0 (fixed count,
            # used here via eps default 0) they must be bit-comparable.
            assert diff < 1e-3, "HARDWARE mismatch"

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
            for fb in FBS:
                d, ok = pallas_lk.lk_level(
                    p0, p1, uv, guess, win=13, iters=10, eps=0.01,
                    affine=affine, batch8=True, fb=fb,
                )
                np.asarray(d)
                t0 = time.time()
                for _ in range(reps):
                    d, ok = pallas_lk.lk_level(
                        p0, p1, uv, guess, win=13, iters=10, eps=0.01,
                        affine=affine, batch8=True, fb=fb,
                    )
                np.asarray(d)
                dt = (time.time() - t0) / reps * 1e3
                print(f"level={level} affine={affine} fb={fb:2d}: "
                      f"{dt:6.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
