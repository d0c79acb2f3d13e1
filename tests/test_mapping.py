"""Scan-to-map refinement tests: cube store bookkeeping, mapping GN
convergence with a perturbed initial guess, and the drift-correction update."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import lidar_mapping as lm
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.utils.config import LidarConfig, MappingConfig


class TestCubeMap:
    def test_insert_and_gather(self, rng):
        m = lm.CubeMap(cube_size=50.0, leaf=0.4)
        pts = rng.uniform(-40, 40, size=(2000, 3)).astype(np.float32)
        m.insert(pts)
        assert len(m.cubes) >= 1
        local = m.gather_local(np.zeros(3), (2, 2, 1), cap=16384)
        got = int(np.asarray(local.mask).sum())
        # every inserted point is within the 5x5x3 x 50 m neighborhood of 0
        assert got > 0
        gathered = np.asarray(local.xyz)[np.asarray(local.mask)]
        assert np.abs(gathered).max() <= 40 + 0.4

    def test_voxel_filter_caps_density(self, rng):
        m = lm.CubeMap(cube_size=50.0, leaf=1.0)
        # 1000 points in one 1 m voxel collapse to a single point
        pts = (5.0 + 0.05 * rng.random(size=(1000, 3))).astype(np.float32)
        m.insert(pts)
        total = sum(c.shape[0] for c in m.cubes.values())
        assert total == 1

    def test_gather_respects_radius(self):
        m = lm.CubeMap(cube_size=50.0, leaf=0.4)
        m.insert(np.array([[0.0, 0, 0], [500.0, 0, 0]], np.float32))
        local = m.gather_local(np.zeros(3), (2, 2, 1), cap=64)
        gathered = np.asarray(local.xyz)[np.asarray(local.mask)]
        assert gathered.shape[0] == 1  # far cube excluded


class TestMappingStep:
    def test_recovers_perturbed_pose(self):
        """Build a map from frame 0 at its TRUE pose, then refine frame 1's
        perturbed pose estimate — must converge back to GT."""
        seq = synthetic.SyntheticSequence(n_frames=3, width=1200, noise=0.003)
        cfg = LidarConfig(azimuth_bins=1024)
        mcfg = MappingConfig(outer_iters=4, gn_iters=4)
        mapper = lm.LidarMapping(mcfg)

        # frame 0 at exact GT pose initializes the map
        xyz, mask = pc.pad_points(seq.scan(0), 131072)
        reg0 = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
        R0, t0 = seq.pose(0)
        pose0 = se3.Pose(
            se3.matrix_to_quat(jnp.asarray(R0, dtype=jnp.float32)),
            jnp.asarray(t0, dtype=jnp.float32),
        )
        mapper.process(reg0.features, pose0)

        # frame 1: feed a perturbed "odometry" pose
        xyz, mask = pc.pad_points(seq.scan(1), 131072)
        reg1 = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
        R1, t1 = seq.pose(1)
        pose1 = se3.Pose(
            se3.matrix_to_quat(jnp.asarray(R1, dtype=jnp.float32)),
            jnp.asarray(t1, dtype=jnp.float32),
        )
        noise = se3.se3_exp(
            jnp.asarray([0.08, -0.05, 0.03, 0.01, -0.008, 0.012], jnp.float32)
        )
        perturbed = se3.se3_compose(noise, pose1)
        refined = mapper.process(reg1.features, perturbed)

        t_err_before = float(jnp.linalg.norm(perturbed.t - pose1.t))
        t_err_after = float(jnp.linalg.norm(refined.t - pose1.t))
        # single-frame map + double 0.4/0.8 m voxel quantization (map side
        # and the reference's pre-association stack filtering) bound the
        # attainable accuracy; require a clear error reduction
        assert t_err_after < 0.65 * t_err_before, (t_err_before, t_err_after)
        assert t_err_after < 0.06

    def test_correction_applied_to_next_frame(self):
        """After refinement, wmap_T_odom must map raw odom poses near the
        refined trajectory (transformAssociateToMap semantics)."""
        mapper = lm.LidarMapping(MappingConfig(outer_iters=1, gn_iters=1))
        ident = se3.identity_pose()
        corr = se3.se3_compose(mapper.correction, ident)
        np.testing.assert_allclose(np.asarray(corr.t), 0.0, atol=1e-7)


class TestFullPipeline:
    import pytest

    @pytest.mark.parametrize("device_map", [False, True])
    def test_mapping_beats_or_matches_odometry(self, device_map):
        from lidar_visual_odometry_tpu.eval import metrics
        from lidar_visual_odometry_tpu.models.pipeline import FullPipeline
        from lidar_visual_odometry_tpu.utils.config import (
            OdometryConfig, SystemConfig,
        )

        n = 5
        seq = synthetic.SyntheticSequence(
            n_frames=n, width=900, noise=0.01, yaw_rate=0.01
        )
        scans = [seq.scan(k) for k in range(n)]
        # GT relative to frame 0 (estimates live in the frame-0 world)
        R0, t0 = seq.pose(0)
        gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=5, gn_iters=4),
            mapping=MappingConfig(
                outer_iters=2, gn_iters=4,
                max_corner_map_local=4096, max_surf_map_local=8192,
                corner_slot=4096, surf_slot=4096,
                map_corner_cap=4096, map_surf_cap=8192,
            ),
        )
        odom, mapped = FullPipeline(cfg, device_map=device_map).run(scans)
        ate_odom = metrics.ate_rmse(odom.positions, gt, align=False)
        ate_map = metrics.ate_rmse(mapped.positions, gt, align=False)
        # mapping must not degrade the trajectory, and both must be sane
        assert ate_map < max(1.2 * ate_odom, 0.05), (ate_odom, ate_map)
        assert ate_map < 0.2


class TestRevisitRegime:
    import pytest

    @pytest.mark.slow
    def test_device_map_survives_out_and_back(self):
        """Out-and-back revisit: after the U-turn the platform re-observes
        frame-0 geometry. The bounded voxel map (±150 m horizon) must keep
        those constraints — mapping must not degrade odometry (the round-1
        8-frame ring buffer lost the map here entirely)."""
        from lidar_visual_odometry_tpu.eval import metrics
        from lidar_visual_odometry_tpu.models.pipeline import FullPipeline
        from lidar_visual_odometry_tpu.utils.config import (
            OdometryConfig, SystemConfig,
        )

        seq = synthetic.PiecewiseArcSequence.out_and_back(
            leg=6, turn=21, width=700, noise=0.01,
        )
        n = seq.n_frames
        scans = [seq.scan(k) for k in range(n)]
        R0, t0 = seq.pose(0)
        gt = np.stack([R0.T @ (seq.pose(k)[1] - t0) for k in range(n)])
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=5, gn_iters=4),
            mapping=MappingConfig(
                outer_iters=2, gn_iters=4,
                corner_slot=4096, surf_slot=4096,
                map_corner_cap=8192, map_surf_cap=16384,
            ),
        )
        odom, mapped = FullPipeline(cfg, capacity=65536).run_chunked(
            scans, chunk=7
        )
        ate_odom = metrics.ate_rmse(odom.positions, gt, align=False)
        ate_map = metrics.ate_rmse(mapped.positions, gt, align=False)
        assert ate_map < max(1.2 * ate_odom, 0.08), (ate_odom, ate_map)
        assert ate_map < 0.35, ate_map
