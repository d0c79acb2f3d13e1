"""Device-resident mapping tests: bounded voxel-store merge semantics
(dedupe, keep-first, farthest-first eviction, drop radius, long-horizon
retention), cold-start algebra (empty map → zero step), and pose refinement
parity with the host cube-map driver on a perturbed estimate."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import device_mapping as dm
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.ops.voxel_map import voxel_merge
from lidar_visual_odometry_tpu.utils.config import LidarConfig, MappingConfig

SMALL = MappingConfig(
    outer_iters=2, gn_iters=4,
    corner_slot=1024, surf_slot=1024,
    map_corner_cap=2048, map_surf_cap=2048,
)


def _step(state, corner, surf, pose, cfg=SMALL):
    cp, cm = pc.pad_points(corner, cfg.corner_slot)
    sp, sm = pc.pad_points(surf, cfg.surf_slot)
    return dm.device_mapping_step(
        state, jnp.asarray(cp), jnp.asarray(cm),
        jnp.asarray(sp), jnp.asarray(sm),
        pose, cfg,
    )


def _merge(map_pb, new_xyz, new_mask, center, leaf=0.4, cap=256, **kw):
    return voxel_merge(
        map_pb.xyz, map_pb.mask, new_xyz, new_mask,
        jnp.asarray(center, jnp.float32), leaf=leaf, cap=cap, **kw,
    )


def _empty(cap=256):
    from lidar_visual_odometry_tpu.ops.pointcloud import PointBatch

    return PointBatch(jnp.zeros((cap, 3), jnp.float32),
                      jnp.zeros((cap,), bool))


class TestVoxelMerge:
    def test_dedupe_idempotent(self, rng):
        """Re-inserting the same cloud must not grow the map."""
        pts = jnp.asarray(rng.uniform(-10, 10, (128, 3)), jnp.float32)
        m = jnp.ones((128,), bool)
        once = _merge(_empty(), pts, m, [0, 0, 0])
        n1 = int(once.mask.sum())
        twice = _merge(once, pts, m, [0, 0, 0])
        assert int(twice.mask.sum()) == n1

    def test_keep_first_is_stable(self):
        """A new point landing in an occupied cell must not move the stored
        point (map geometry is stable; ≡ the ~1 pt/leaf filtered cube store,
        laserMapping.cpp:787-801)."""
        old = jnp.asarray([[1.00, 1.00, 1.00]], jnp.float32)
        new = jnp.asarray([[1.05, 1.05, 1.05]], jnp.float32)  # same 0.4 cell
        m1 = jnp.ones((1,), bool)
        mp = _merge(_empty(), old, m1, [0, 0, 0])
        mp = _merge(mp, new, m1, [0, 0, 0])
        got = np.asarray(mp.xyz)[np.asarray(mp.mask)]
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], [1.0, 1.0, 1.0], atol=1e-6)

    def test_eviction_keeps_nearest(self, rng):
        """Over capacity, the cells farthest from the pose evict first."""
        # 512 cells on a line x = 0.5, 1.5, ..., all distinct 0.4-leaf cells
        xs = (0.45 * np.arange(512) + 0.2).astype(np.float32)
        pts = jnp.asarray(np.stack([xs, np.zeros(512), np.zeros(512)], -1))
        m = jnp.ones((512,), bool)
        mp = _merge(_empty(cap=128), pts, m, [0, 0, 0], cap=128,
                    drop_radius=1e4)
        got = np.sort(np.asarray(mp.xyz)[np.asarray(mp.mask)][:, 0])
        assert got.shape[0] == 128
        # kept set = the 128 nearest (bucket granularity is 16 m → exact here
        # only up to bucket width; assert no kept point is beyond the worst
        # bucket of the 128-nearest cutoff)
        cutoff = xs[127]
        assert got.max() < np.sqrt(cutoff**2 + 256.0) + 16.0

    def test_drop_radius(self):
        pts = jnp.asarray([[10.0, 0, 0], [400.0, 0, 0]], jnp.float32)
        m = jnp.ones((2,), bool)
        mp = _merge(_empty(), pts, m, [0, 0, 0], drop_radius=150.0)
        got = np.asarray(mp.xyz)[np.asarray(mp.mask)]
        assert got.shape[0] == 1 and got[0, 0] == 10.0

    def test_recenter_alignment(self):
        """Cell boundaries must not shift when the center moves: a stored
        point and a same-cell new point still dedupe after a recenter."""
        old = jnp.asarray([[100.00, 1.00, 1.00]], jnp.float32)
        new = jnp.asarray([[100.05, 1.05, 1.05]], jnp.float32)
        m1 = jnp.ones((1,), bool)
        mp = _merge(_empty(), old, m1, [0, 0, 0])
        # center moved 87 m → origin steps by a leaf-aligned quantum
        mp = _merge(mp, new, m1, [87.3, 0, 0])
        got = np.asarray(mp.xyz)[np.asarray(mp.mask)]
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], [100.0, 1.0, 1.0], atol=1e-5)


class TestDeviceMapStore:
    def test_cold_start_keeps_init_pose(self, rng):
        state = dm.init_state(SMALL)
        pts = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
        pose = se3.Pose(
            se3.quat_normalize(jnp.asarray([0.9, 0.1, 0.0, 0.0])),
            jnp.asarray([1.0, 2.0, 3.0], jnp.float32),
        )
        state, refined = _step(state, pts, pts, pose)
        np.testing.assert_allclose(np.asarray(refined.t), np.asarray(pose.t),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(refined.q), np.asarray(pose.q),
                                   atol=1e-5)
        assert bool(state.corner_mask.any())

    def test_long_horizon_retention(self, rng):
        """Geometry from frame 0 must survive 30 frames of forward motion
        (the round-1 8-frame ring buffer lost it after ~1 s — VERDICT §2)."""
        state = dm.init_state(SMALL)
        landmark = (rng.uniform(-3, 3, (64, 3)) + [0.0, 20.0, 0.0]).astype(
            np.float32
        )
        ident_q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        for k in range(31):
            pose = se3.Pose(ident_q, jnp.asarray([2.0 * k, 0, 0], jnp.float32))
            pts = (rng.uniform(-3, 3, (64, 3))
                   + [2.0 * k, -20.0, 0]).astype(np.float32)
            if k == 0:
                pts = np.concatenate([pts, landmark])
            state, _ = _step(state, pts, pts, pose)
        c = np.asarray(state.corner)[np.asarray(state.corner_mask)]
        # landmark cells (y ≈ +20 near x=0) still present, 60 m later
        near_landmark = (np.abs(c[:, 1] - 20.0) < 4) & (np.abs(c[:, 0]) < 4)
        assert near_landmark.sum() > 16

    def test_export_roundtrip(self, rng):
        mapper = dm.DeviceMapping(SMALL)
        from lidar_visual_odometry_tpu.ops.features import (
            FeatureCloud, ScanFeatures,
        )

        pts = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
        xyz, mask = pc.pad_points(pts, 1024)
        cloud = FeatureCloud(
            jnp.asarray(xyz), jnp.zeros(1024, jnp.int32),
            jnp.zeros(1024, jnp.float32), jnp.asarray(mask),
        )
        feats = ScanFeatures(
            sharp=cloud, less_sharp=cloud, flat=cloud, less_flat=cloud
        )
        mapper.process(feats, se3.identity_pose())
        corner, surf = mapper.export_map()
        assert corner.shape[0] > 0 and corner.shape[1] == 3
        # exported points are (a voxel-mean subset of) the inserted cloud
        assert np.abs(corner).max() < 20.0 + SMALL.corner_leaf


class TestSlamChunk:
    def test_fused_chunk_matches_per_frame_path(self):
        """slam_chunk_quantized's odometry poses must equal the plain
        odometry chunk (same math, same quantized input), and its mapped
        trajectory must stay close to ground truth."""
        from lidar_visual_odometry_tpu.eval import metrics
        from lidar_visual_odometry_tpu.models.pipeline import (
            FullPipeline, OdometryPipeline,
        )
        from lidar_visual_odometry_tpu.utils.config import (
            OdometryConfig, SystemConfig,
        )

        n = 5
        seq = synthetic.SyntheticSequence(
            n_frames=n, width=900, noise=0.01, yaw_rate=0.01
        )
        scans = [seq.scan(k) for k in range(n)]
        R0, t0 = seq.pose(0)
        gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=5, gn_iters=4),
            mapping=MappingConfig(
                outer_iters=2, gn_iters=4,
                corner_slot=4096, surf_slot=4096,
                map_corner_cap=4096, map_surf_cap=8192,
            ),
        )
        odom, mapped = FullPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=2
        )
        ref = OdometryPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=2, quantize=True
        )
        np.testing.assert_allclose(odom.positions, ref.positions, atol=1e-4)
        ate_map = metrics.ate_rmse(mapped.positions, gt, align=False)
        ate_odom = metrics.ate_rmse(odom.positions, gt, align=False)
        assert ate_map < max(1.2 * ate_odom, 0.05), (ate_odom, ate_map)

        # map_skip=2 (the reference's ~5 Hz mapping cadence): odometry
        # identical, skipped frames composed through wmap_T_odom, and the
        # mapped trajectory still sane
        odom2, mapped2 = FullPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=2, map_skip=2
        )
        np.testing.assert_allclose(odom2.positions, ref.positions, atol=1e-4)
        ate_map2 = metrics.ate_rmse(mapped2.positions, gt, align=False)
        assert ate_map2 < max(1.5 * ate_odom, 0.06), (ate_odom, ate_map2)

    def test_polar_ingest_close_to_quantized(self):
        """slam_chunk_polar (packed polar ingest) tracks the uint16 path
        within the ingest quantization floor, odometry and mapped alike."""
        from lidar_visual_odometry_tpu.models.pipeline import FullPipeline
        from lidar_visual_odometry_tpu.utils.config import (
            OdometryConfig, SystemConfig,
        )

        n = 5
        seq = synthetic.SyntheticSequence(
            n_frames=n, width=900, noise=0.01, yaw_rate=0.01
        )
        scans = [seq.scan(k) for k in range(n)]
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=5, gn_iters=4),
            mapping=MappingConfig(
                outer_iters=2, gn_iters=4,
                corner_slot=4096, surf_slot=4096,
                map_corner_cap=4096, map_surf_cap=8192,
            ),
        )
        odo_a, map_a = FullPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=2
        )
        odo_b, map_b = FullPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=2, ingest="polar"
        )
        np.testing.assert_allclose(
            odo_a.positions, odo_b.positions, atol=2e-2
        )
        np.testing.assert_allclose(
            map_a.positions, map_b.positions, atol=3e-2
        )


class TestDeviceRefinement:
    def test_recovers_perturbed_pose(self):
        """Mirror of the host-driver test (test_mapping.py): map seeded at
        the true frame-0 pose, frame 1 fed a perturbed odometry pose."""
        from lidar_visual_odometry_tpu.models import scan_registration as sr

        seq = synthetic.SyntheticSequence(n_frames=3, width=1200, noise=0.003)
        lcfg = LidarConfig(azimuth_bins=1024)
        mcfg = MappingConfig(
            outer_iters=4, gn_iters=4,
            corner_slot=4096, surf_slot=4096,
            map_corner_cap=4096, map_surf_cap=8192,
        )
        state = dm.init_state(mcfg)

        def register(k):
            xyz, mask = pc.pad_points(seq.scan(k), 131072)
            reg = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), lcfg)
            R, t = seq.pose(k)
            pose = se3.Pose(
                se3.matrix_to_quat(jnp.asarray(R, dtype=jnp.float32)),
                jnp.asarray(t, dtype=jnp.float32),
            )
            return reg.features, pose

        feats0, pose0 = register(0)
        state, _ = dm.device_mapping_step(
            state, feats0.less_sharp.xyz, feats0.less_sharp.mask,
            feats0.less_flat.xyz, feats0.less_flat.mask, pose0, mcfg,
        )

        feats1, pose1 = register(1)
        noise = se3.se3_exp(
            jnp.asarray([0.08, -0.05, 0.03, 0.01, -0.008, 0.012], jnp.float32)
        )
        perturbed = se3.se3_compose(noise, pose1)
        state, refined = dm.device_mapping_step(
            state, feats1.less_sharp.xyz, feats1.less_sharp.mask,
            feats1.less_flat.xyz, feats1.less_flat.mask, perturbed, mcfg,
        )

        t_err_before = float(jnp.linalg.norm(perturbed.t - pose1.t))
        t_err_after = float(jnp.linalg.norm(refined.t - pose1.t))
        assert t_err_after < 0.65 * t_err_before, (t_err_before, t_err_after)
        assert t_err_after < 0.06
        # correction must map the raw odom pose onto the refined one
        corr = se3.se3_compose(state.correction, perturbed)
        np.testing.assert_allclose(
            np.asarray(corr.t), np.asarray(refined.t), atol=1e-5
        )
