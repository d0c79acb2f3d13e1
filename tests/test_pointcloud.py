"""Range-image build, ring compaction, and voxel downsample tests
(SURVEY.md §4: grid/feature kernels vs handcrafted clouds + brute force)."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.ops import pointcloud as pc


def make_scan():
    seq = synthetic.SyntheticSequence(n_frames=1, width=900)
    return seq.scan(0)


class TestRangeImage:
    def test_build_and_compact(self):
        pts = make_scan()
        xyz, mask = pc.pad_points(pts, 131072)
        ri = pc.build_range_image(
            jnp.asarray(xyz), jnp.asarray(mask),
            n_scans=64, width=1024, min_range=0.1,
        )
        # reference drops HDL-64 rings > 50 (scanRegistration.cpp:196); count
        # only eligible points, then require near-complete gridding
        ring, ok = pc.ring_index_hdl(jnp.asarray(xyz), 64)
        n_eligible = int((np.asarray(ok) & mask).sum())
        n_grid = int(np.asarray(ri.valid).sum())
        assert n_grid > 0.95 * n_eligible
        # all gridded points preserve their coordinates
        got = np.asarray(ri.xyz)[np.asarray(ri.valid)]
        assert got.shape[1] == 3 and np.isfinite(got).all()

        cs = pc.compact_rings(ri)
        count = np.asarray(cs.count)
        assert count.sum() == n_grid
        v = np.asarray(cs.valid)
        for r in range(64):
            assert v[r, : count[r]].all() and not v[r, count[r]:].any()

    def test_ring_assignment_matches_elevation(self):
        # points generated exactly on ring elevations must map to those rings
        elev = synthetic.hdl64_elevations()
        az = np.linspace(-np.pi, np.pi, 64, endpoint=False)
        d = 10.0
        pts = np.stack(
            [
                d * np.cos(np.radians(elev)) * np.cos(az),
                -d * np.cos(np.radians(elev)) * np.sin(az),
                d * np.sin(np.radians(elev)),
            ],
            axis=-1,
        ).astype(np.float32)
        ring, ok = pc.ring_index_hdl(jnp.asarray(pts), 64)
        ring, ok = np.asarray(ring), np.asarray(ok)
        expected = np.arange(64)
        sel = ok & (expected <= 50)  # reference drops rings > 50
        assert (ring[sel] == expected[sel]).all()

    def test_min_range_filter(self):
        pts = np.array([[0.05, 0, 0], [5.0, 0, 0.1]], dtype=np.float32)
        xyz, mask = pc.pad_points(pts, 8)
        ri = pc.build_range_image(
            jnp.asarray(xyz), jnp.asarray(mask), n_scans=64, width=64, min_range=0.5
        )
        assert int(np.asarray(ri.valid).sum()) == 1


class TestVoxelDownsample:
    def test_matches_bruteforce_mean(self, rng):
        pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
        xyz, mask = pc.pad_points(pts, 512)
        out = pc.voxel_downsample(
            jnp.asarray(xyz), jnp.asarray(mask), leaf=1.0, max_out=1024
        )
        got = np.asarray(out.xyz)[np.asarray(out.mask)]

        # brute-force reference
        q = np.floor((pts - (-1024.0)) / 1.0).astype(np.int64)
        cells = {}
        for p, c in zip(pts, map(tuple, q)):
            cells.setdefault(c, []).append(p)
        want = np.array([np.mean(v, axis=0) for v in cells.values()])

        assert got.shape[0] == want.shape[0]
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)

    def test_budget_overflow_drops(self, rng):
        pts = rng.uniform(-50, 50, size=(256, 3)).astype(np.float32)
        xyz, mask = pc.pad_points(pts, 256)
        out = pc.voxel_downsample(
            jnp.asarray(xyz), jnp.asarray(mask), leaf=0.5, max_out=64
        )
        assert int(np.asarray(out.mask).sum()) == 64

    def test_budget_overflow_is_spatially_unbiased(self):
        """An overflow must drop a pseudo-random subsample, not one side of
        the cloud (a cell-id-ordered drop keeps only low-x voxels, which
        biases every downstream pose solve)."""
        # 1024 distinct voxels along x, keep 256
        pts = np.stack(
            [np.arange(1024) * 1.0, np.zeros(1024), np.zeros(1024)], axis=-1
        ).astype(np.float32) + 0.5
        xyz, mask = pc.pad_points(pts, 1024)
        out = pc.voxel_downsample(
            jnp.asarray(xyz), jnp.asarray(mask), leaf=1.0, max_out=256
        )
        kept = np.asarray(out.xyz)[np.asarray(out.mask)][:, 0]
        assert kept.shape[0] == 256
        # kept sample must span the full range and hit every quartile
        hist, _ = np.histogram(kept, bins=4, range=(0.0, 1024.0))
        assert (hist > 20).all(), hist


class TestBuildCompactScan:
    def test_matches_two_step_pipeline(self):
        """The fused sort-based binning must reproduce
        compact_rings(build_range_image(...)) exactly (same nearest-return
        winners, same compacted order)."""
        pts = make_scan()
        xyz, mask = pc.pad_points(pts, 131072)
        kw = dict(n_scans=64, width=1024, min_range=0.1)
        old = pc.compact_rings(
            pc.build_range_image(jnp.asarray(xyz), jnp.asarray(mask), **kw)
        )
        new = pc.build_compact_scan(jnp.asarray(xyz), jnp.asarray(mask), **kw)
        np.testing.assert_array_equal(np.asarray(old.count), np.asarray(new.count))
        np.testing.assert_array_equal(np.asarray(old.valid), np.asarray(new.valid))
        v = np.asarray(old.valid)
        np.testing.assert_array_equal(
            np.asarray(old.xyz)[v], np.asarray(new.xyz)[v]
        )
        np.testing.assert_array_equal(
            np.asarray(old.rel_time)[v], np.asarray(new.rel_time)[v]
        )


class TestVoxelDownsampleBatched:
    def test_matches_vmapped(self, rng):
        import jax

        xyz = rng.uniform(-20, 20, (8, 256, 3)).astype(np.float32)
        mask = rng.random((8, 256)) < 0.8
        # no-overflow budget: under overflow the two paths keep different
        # (each deterministic) voxel subsets — cell-id order vs hash order
        got = pc.voxel_downsample_batched(
            jnp.asarray(xyz), jnp.asarray(mask), leaf=0.7, max_out=256
        )
        want = jax.vmap(
            lambda p, m: pc.voxel_downsample(p, m, leaf=0.7, max_out=256)
        )(jnp.asarray(xyz), jnp.asarray(mask))
        # the two paths emit voxels in different (but deterministic) orders:
        # cell-id order (batched) vs hash order (single, for unbiased drops)
        # — compare as sets of voxel centroids per row
        for r in range(8):
            g = np.asarray(got.xyz[r])[np.asarray(got.mask[r])]
            w = np.asarray(want.xyz[r])[np.asarray(want.mask[r])]
            assert g.shape == w.shape
            np.testing.assert_allclose(
                g[np.lexsort(g.T)], w[np.lexsort(w.T)], atol=1e-5
            )


class TestSynthetic:
    def test_sequence_geometry(self):
        seq = synthetic.SyntheticSequence(n_frames=3, width=600, speed=1.0)
        s0 = seq.scan(0)
        assert s0.shape[0] > 10000
        # ground points at sensor height below origin
        ground = s0[np.abs(s0[:, 2] + 1.73) < 0.02]
        assert ground.shape[0] > 1000
        # relative GT is ~1 m forward
        R, t = seq.gt_relative(0)
        np.testing.assert_allclose(t[0], 1.0, atol=0.01)
