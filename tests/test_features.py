"""Feature-extraction tests: parity against a literal numpy replica of the
A-LOAM selection loop on real-ish scans, plus handcrafted-geometry checks."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import features as F
from lidar_visual_odometry_tpu.ops import pointcloud as pc
from lidar_visual_odometry_tpu.utils.config import LidarConfig


def reference_select(ring_pts, n_sectors=6, max_sharp=2, max_less_sharp=20,
                     max_flat=4, gate=0.1):
    """Literal numpy transcription of scanRegistration.cpp:256-398 for ONE
    compacted ring: returns (sharp, less_sharp, flat) index lists."""
    n = len(ring_pts)
    pts = np.asarray(ring_pts)
    curv = np.zeros(n)
    for i in range(5, n - 5):
        # Σ(10 neighbors) − 10·p  ==  Σ(window incl. p) − 11·p
        d = pts[i - 5:i + 6].sum(axis=0) - 11 * pts[i]
        curv[i] = (d * d).sum()
    picked = np.zeros(n, dtype=bool)
    sharp, less_sharp, flat = [], [], []
    if n - 11 < 6:
        return sharp, less_sharp, flat
    start, end = 5, n - 6
    for j in range(n_sectors):
        sp = start + (end - start) * j // n_sectors
        ep = start + (end - start) * (j + 1) // n_sectors - 1
        order = sorted(range(sp, ep + 1), key=lambda i: curv[i])
        # corners: descending
        npick = 0
        for i in reversed(order):
            if not picked[i] and curv[i] > gate:
                npick += 1
                if npick <= max_sharp:
                    sharp.append(i)
                    less_sharp.append(i)
                elif npick <= max_less_sharp:
                    less_sharp.append(i)
                else:
                    break
                picked[i] = True
                for l in range(1, 6):
                    if i + l >= n or ((pts[i + l] - pts[i + l - 1]) ** 2).sum() > 0.05:
                        break
                    picked[i + l] = True
                for l in range(1, 6):
                    if i - l < 0 or ((pts[i - l] - pts[i - l + 1]) ** 2).sum() > 0.05:
                        break
                    picked[i - l] = True
        # flats: ascending
        npick = 0
        for i in order:
            if not picked[i] and curv[i] < gate:
                flat.append(i)
                npick += 1
                if npick >= max_flat:
                    break
                picked[i] = True
                for l in range(1, 6):
                    if i + l >= n or ((pts[i + l] - pts[i + l - 1]) ** 2).sum() > 0.05:
                        break
                    picked[i + l] = True
                for l in range(1, 6):
                    if i - l < 0 or ((pts[i - l] - pts[i - l + 1]) ** 2).sum() > 0.05:
                        break
                    picked[i - l] = True
    return sharp, less_sharp, flat


def single_ring_scan(pts):
    """Build a CompactScan holding one ring of given points, padded to W."""
    W = 256
    n = len(pts)
    xyz = np.zeros((1, W, 3), np.float32)
    xyz[0, :n] = pts
    valid = np.zeros((1, W), bool)
    valid[0, :n] = True
    return pc.CompactScan(
        jnp.asarray(xyz),
        jnp.asarray(valid),
        jnp.zeros((1, W), jnp.float32),
        jnp.asarray([n], jnp.int32),
    )


class TestCurvature:
    def test_straight_line_zero(self):
        pts = np.stack([np.linspace(0, 10, 40), np.full(40, 5.0), np.zeros(40)], -1)
        cs = single_ring_scan(pts)
        curv, elig = F.curvature(cs)
        c = np.asarray(curv)[0, 5:35]
        np.testing.assert_allclose(c, 0.0, atol=1e-8)
        assert np.asarray(elig)[0, 5:35].all()

    def test_corner_peak(self):
        # L-shaped wall: corner at index 20
        a = np.stack([np.linspace(0, 2, 21), np.full(21, 2.0), np.zeros(21)], -1)
        b = np.stack([np.full(20, 2.0), np.linspace(1.9, 0, 20), np.zeros(20)], -1)
        pts = np.concatenate([a, b])
        cs = single_ring_scan(pts)
        curv, _ = F.curvature(cs)
        c = np.asarray(curv)[0]
        assert c[5:36].argmax() + 5 in (19, 20, 21)


class TestSelectionParity:
    def test_matches_reference_greedy(self, rng):
        # jagged synthetic ring: mixture of smooth arcs and jumps
        n = 200
        t = np.linspace(0, 2 * np.pi, n)
        r = 10 + 0.5 * np.sin(5 * t) + 0.1 * rng.normal(size=n)
        jumps = rng.choice(n, 8, replace=False)
        r[jumps] += rng.uniform(1, 3, size=8)
        pts = np.stack([r * np.cos(t), r * np.sin(t), 0.05 * rng.normal(size=n)], -1
                       ).astype(np.float32)
        want_sharp, want_ls, want_flat = reference_select(pts.astype(np.float64))

        cs = single_ring_scan(pts)
        feats = F.extract_features(cs)
        R, W = 1, 256

        def got_indices(fc):
            m = np.asarray(fc.mask)
            xyz = np.asarray(fc.xyz)[m]
            # map back to ring indices by exact coordinate match
            out = []
            for p in xyz:
                d = np.abs(pts - p).sum(axis=1)
                out.append(int(d.argmin()))
            return out

        got_sharp = got_indices(feats.sharp)
        got_ls = got_indices(feats.less_sharp)
        got_flat = got_indices(feats.flat)
        assert sorted(got_sharp) == sorted(want_sharp)
        assert sorted(got_ls) == sorted(want_ls)
        assert sorted(got_flat) == sorted(want_flat)


class TestRegisterScan:
    def test_full_stage_on_synthetic(self):
        seq = synthetic.SyntheticSequence(n_frames=1, width=900, noise=0.005)
        pts = seq.scan(0)
        xyz, mask = pc.pad_points(pts, 131072)
        cfg = LidarConfig(azimuth_bins=1024)
        out = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
        f = out.features
        n_sharp = int(np.asarray(f.sharp.mask).sum())
        n_ls = int(np.asarray(f.less_sharp.mask).sum())
        n_flat = int(np.asarray(f.flat.mask).sum())
        n_lf = int(np.asarray(f.less_flat.mask).sum())
        # structured scene must yield features of every class
        assert n_sharp > 50, n_sharp
        assert n_ls >= n_sharp
        assert n_flat > 200, n_flat
        assert n_lf > 3000, n_lf
        # sharp ⊆ less_sharp by construction; flats mostly on ground/walls
        flat_pts = np.asarray(f.flat.xyz)[np.asarray(f.flat.mask)]
        ground = np.abs(flat_pts[:, 2] + 1.73) < 0.1
        assert ground.mean() > 0.2
