"""Device-resident mapping tests: ring-buffer insert/evict semantics,
cold-start algebra (empty map → zero step), and pose refinement parity with
the host cube-map driver on a perturbed estimate."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import device_mapping as dm
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.utils.config import LidarConfig, MappingConfig

SMALL = MappingConfig(
    outer_iters=2, gn_iters=4,
    submap_frames=3, corner_slot=1024, surf_slot=1024,
)


def _step(state, corner, surf, pose, cfg=SMALL):
    cp, cm = pc.pad_points(corner, cfg.corner_slot)
    sp, sm = pc.pad_points(surf, cfg.surf_slot)
    return dm.device_mapping_step(
        state, jnp.asarray(cp), jnp.asarray(cm),
        jnp.asarray(sp), jnp.asarray(sm),
        pose, cfg,
    )


class TestRingBuffer:
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
        assert int(state.cursor) == 1
        assert bool(state.corner_mask[0].any())

    def test_oldest_slab_evicted(self, rng):
        state = dm.init_state(SMALL)
        ident = se3.identity_pose()
        # F+1 frames, each a distinct x-offset slab
        for k in range(SMALL.submap_frames + 1):
            pts = (rng.uniform(-5, 5, (64, 3)) + [100.0 * k, 0, 0]).astype(
                np.float32
            )
            state, _ = _step(state, pts, pts, ident)
        c = np.asarray(state.corner.reshape(-1, 3))
        m = np.asarray(state.corner_mask.reshape(-1))
        xs = c[m][:, 0]
        # frame 0's slab (x≈0) was overwritten by frame F's (x≈300)
        assert xs.min() > 50.0
        assert xs.max() > 250.0

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
        import jax

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
                submap_frames=4, corner_slot=4096, surf_slot=4096,
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


class TestDeviceRefinement:
    def test_recovers_perturbed_pose(self):
        """Mirror of the host-driver test (test_mapping.py): map seeded at
        the true frame-0 pose, frame 1 fed a perturbed odometry pose."""
        seq = synthetic.SyntheticSequence(n_frames=3, width=1200, noise=0.003)
        lcfg = LidarConfig(azimuth_bins=1024)
        mcfg = MappingConfig(
            outer_iters=4, gn_iters=4,
            submap_frames=4, corner_slot=2048, surf_slot=4096,
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
