"""Scan-to-scan odometry tests: Jacobian finite-difference checks (the
README's Basalt-vs-numeric exercise as an actual test, SURVEY.md §4), GN
convergence on synthetic problems with known optimum, and end-to-end
two-frame motion recovery on the synthetic corridor."""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import gn, knn, lidar_factors as lf, se3
from lidar_visual_odometry_tpu.ops import pointcloud as pc
from lidar_visual_odometry_tpu.utils.config import LidarConfig, OdometryConfig


def rand_pose(rng, scale=0.3):
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * scale)
    return se3.se3_exp(xi)


class TestJacobians:
    """Analytic J vs jax.jacfwd through the residual (autodiff ground truth)."""

    def _check(self, residual_fn, corr, rng, atol=1e-3):
        pose = rand_pose(rng)
        r, J = residual_fn(pose, corr)

        def r_of_delta(delta):
            p2 = gn.gn_update_pose(pose, delta)
            return residual_fn(p2, corr)[0]

        J_num = np.asarray(jax.jacfwd(r_of_delta)(jnp.zeros(6)))
        np.testing.assert_allclose(
            np.asarray(J).reshape(J_num.shape), J_num, atol=atol, rtol=1e-3
        )

    def test_edge_jacobian(self, rng):
        n = 8
        corr = lf.EdgeCorr(
            p=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            a=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            b=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            s=jnp.ones((n,)),
            mask=jnp.ones((n,), bool),
        )
        self._check(lf.edge_residuals, corr, rng)

    def test_plane_jacobian(self, rng):
        n = 8
        corr = lf.PlaneCorr(
            p=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            j=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            l=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            m=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            s=jnp.ones((n,)),
            mask=jnp.ones((n,), bool),
        )
        self._check(lf.plane_residuals, corr, rng)

    def test_norm_plane_jacobian(self, rng):
        n = 8
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        corr = lf.NormPlaneCorr(
            p=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
            n=jnp.asarray(nrm),
            d=jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
            mask=jnp.ones((n,), bool),
        )
        self._check(lf.norm_plane_residuals, corr, rng)


class TestGNSynthetic:
    def test_point_to_plane_recovers_pose(self, rng):
        """Points on 3 orthogonal planes constrain all 6 dof; GN from identity
        must recover a known small transform."""
        true = se3.se3_exp(
            jnp.asarray([0.2, -0.1, 0.15, 0.03, -0.02, 0.04], jnp.float32)
        )
        # sample points on planes x=0, y=0, z=0 in the LAST frame
        pts = []
        normals = []
        for ax in range(3):
            p = rng.uniform(-5, 5, size=(64, 3)).astype(np.float32)
            p[:, ax] = 0.0
            n = np.zeros((64, 3), np.float32)
            n[:, ax] = 1.0
            pts.append(p)
            normals.append(n)
        last_pts = jnp.asarray(np.concatenate(pts))
        n = jnp.asarray(np.concatenate(normals))
        # current-frame points: x_curr = T⁻¹ x_last
        curr_pts = se3.se3_apply(se3.se3_inverse(true), last_pts)
        corr = lf.NormPlaneCorr(
            p=curr_pts, n=n, d=-jnp.sum(n * last_pts, axis=-1),
            mask=jnp.ones((last_pts.shape[0],), bool),
        )

        pose = se3.identity_pose()
        for _ in range(8):
            r, J = lf.norm_plane_residuals(pose, corr)
            H, g = gn.accumulate(r, J, jnp.ones_like(r[..., 0]), corr.mask)
            pose = gn.gn_update_pose(pose, gn.solve_damped(H, g))
        err = se3.se3_log(se3.se3_compose(se3.se3_inverse(true), pose))
        assert float(jnp.abs(err).max()) < 1e-4


class TestKNN:
    def test_knn_matches_bruteforce(self, rng):
        q = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
        m = jnp.asarray(rng.uniform(size=500) > 0.2)
        idx, d = knn.knn(q, c, m, k=5)
        idx_chunked, d_chunked = knn.knn(q, c, m, k=5, chunk=128)
        D = np.linalg.norm(
            np.asarray(q)[:, None] - np.asarray(c)[None], axis=-1
        ) ** 2
        D[:, ~np.asarray(m)] = np.inf
        want = np.argsort(D, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(idx_chunked), want)
        np.testing.assert_allclose(
            np.asarray(d), np.sort(D, axis=1)[:, :5], rtol=1e-4, atol=1e-4
        )

    def test_edge_assoc_ring_window(self):
        # candidates on rings 0..5 along a line; query near ring 2
        c = jnp.asarray(
            [[float(i), 0.0, 0.0] for i in range(6)], jnp.float32
        )
        rings = jnp.arange(6, dtype=jnp.int32)
        q = jnp.asarray([[2.1, 0.0, 0.0]], jnp.float32)
        ea = knn.associate_edges(
            q, jnp.ones((1,), bool), c, rings, jnp.ones((6,), bool)
        )
        assert int(ea.j0[0]) == 2
        # nearest different-ring within ±2.5 rings of ring 2 → ring 3 (x=3)
        assert int(ea.j2[0]) == 3
        assert bool(ea.valid[0])


class TestEndToEnd:
    def test_two_frame_motion_recovery(self):
        seq = synthetic.SyntheticSequence(
            n_frames=3, width=1200, speed=1.0, yaw_rate=0.01, noise=0.005
        )
        cfg = LidarConfig(azimuth_bins=1024)
        ocfg = OdometryConfig(outer_iters=10, gn_iters=4)
        odom = lo.LidarOdometry(ocfg)
        est_rel = []
        for k in range(2):
            xyz, mask = pc.pad_points(seq.scan(k), 131072)
            reg = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
            _, rel = odom.process(reg.features)
            est_rel.append(rel)

        R_gt, t_gt = seq.gt_relative(0)
        # frame 1's relative pose is sensor_0 ← sensor_1
        rel = est_rel[1]
        t_est = np.asarray(rel.t)
        R_est = np.asarray(se3.quat_to_matrix(rel.q))
        t_err = np.linalg.norm(t_est - t_gt)
        R_err = np.degrees(
            np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1))
        )
        assert t_err < 0.02, (t_est, t_gt)
        assert R_err < 0.2, R_err


class TestRingBlockedAssocParity:
    """Ring-blocked streaming association must equal the dense masked-argmin
    formulation on ring-major candidate clouds."""

    def test_parity(self, rng):
        R, B = 16, 32
        c = rng.normal(size=(R * B, 3)).astype(np.float32) * 8
        rings = np.repeat(np.arange(R, dtype=np.int32), B)
        cm = rng.uniform(size=R * B) > 0.2
        q = rng.normal(size=(64, 3)).astype(np.float32) * 8
        qm = np.ones(64, bool)

        ea_dense = knn.associate_edges(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(c), jnp.asarray(rings),
            jnp.asarray(cm))
        ea_blk = knn.associate_edges_ringblocked(
            jnp.asarray(q), jnp.asarray(qm),
            jnp.asarray(c.reshape(R, B, 3)), jnp.asarray(cm.reshape(R, B)))
        np.testing.assert_array_equal(np.asarray(ea_dense.valid), np.asarray(ea_blk.valid))
        v = np.asarray(ea_dense.valid)
        np.testing.assert_array_equal(np.asarray(ea_dense.j0)[v], np.asarray(ea_blk.j0)[v])
        np.testing.assert_array_equal(np.asarray(ea_dense.j2)[v], np.asarray(ea_blk.j2)[v])

        pa_dense = knn.associate_planes(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(c), jnp.asarray(rings),
            jnp.asarray(cm))
        pa_blk = knn.associate_planes_ringblocked(
            jnp.asarray(q), jnp.asarray(qm),
            jnp.asarray(c.reshape(R, B, 3)), jnp.asarray(cm.reshape(R, B)))
        np.testing.assert_array_equal(np.asarray(pa_dense.valid), np.asarray(pa_blk.valid))
        v = np.asarray(pa_dense.valid)
        for a, b in ((pa_dense.j0, pa_blk.j0), (pa_dense.j2, pa_blk.j2), (pa_dense.j3, pa_blk.j3)):
            np.testing.assert_array_equal(np.asarray(a)[v], np.asarray(b)[v])


class TestChunkedPipeline:
    def test_chunked_matches_per_frame(self):
        from lidar_visual_odometry_tpu.models.pipeline import OdometryPipeline
        from lidar_visual_odometry_tpu.utils.config import SystemConfig

        seq = synthetic.SyntheticSequence(n_frames=5, width=600, noise=0.005)
        scans = [seq.scan(k) for k in range(4)]
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=4, gn_iters=4),
        )
        a = OdometryPipeline(cfg).run(scans)
        b = OdometryPipeline(cfg).run_chunked(scans, chunk=3)
        np.testing.assert_allclose(a.positions, b.positions, atol=1e-4)

    def test_quantized_chunk_close_to_float(self):
        """uint16 transfer quantization (3.9 mm resolution) must not move the
        trajectory beyond the noise floor."""
        from lidar_visual_odometry_tpu.models.pipeline import OdometryPipeline
        from lidar_visual_odometry_tpu.utils.config import SystemConfig

        seq = synthetic.SyntheticSequence(n_frames=5, width=600, noise=0.005)
        scans = [seq.scan(k) for k in range(4)]
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=4, gn_iters=4),
        )
        a = OdometryPipeline(cfg).run_chunked(scans, chunk=3)
        b = OdometryPipeline(cfg).run_chunked(scans, chunk=3, quantize=True)
        np.testing.assert_allclose(a.positions, b.positions, atol=2e-2)


class TestDeskew:
    def test_deskew_path_runs_and_converges(self):
        """DISTORTION=1 analog: per-point fractional pose interpolation
        (XLA path — the fused kernel covers only s=1)."""
        seq = synthetic.SyntheticSequence(
            n_frames=3, width=1200, speed=1.0, noise=0.005
        )
        cfg = LidarConfig(azimuth_bins=1024)
        ocfg = OdometryConfig(outer_iters=6, gn_iters=4, deskew=True)
        odom = lo.LidarOdometry(ocfg)
        for k in range(2):
            xyz, mask = pc.pad_points(seq.scan(k), 131072)
            reg = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
            _, rel = odom.process(reg.features)
        R_gt, t_gt = seq.gt_relative(0)
        t_est = np.asarray(rel.t)
        # static scene ⇒ deskew(s≈const sweep) still recovers motion within
        # a looser bound (interpolated poses shrink effective motion per point)
        assert np.isfinite(t_est).all()
        assert np.linalg.norm(t_est - t_gt) < 0.6, (t_est, t_gt)

    def test_polar_chunk_close_to_float(self):
        """Packed polar ingest (range 2 mm + int8 angular offsets,
        pointcloud.pack_polar_scan) must not move the trajectory beyond the
        noise floor either."""
        from lidar_visual_odometry_tpu.models.pipeline import OdometryPipeline
        from lidar_visual_odometry_tpu.utils.config import SystemConfig

        seq = synthetic.SyntheticSequence(n_frames=5, width=600, noise=0.005)
        scans = [seq.scan(k) for k in range(4)]
        cfg = SystemConfig(
            lidar=LidarConfig(azimuth_bins=1024),
            odometry=OdometryConfig(outer_iters=4, gn_iters=4),
        )
        a = OdometryPipeline(cfg).run_chunked(scans, chunk=3)
        b = OdometryPipeline(cfg).run_chunked(scans, chunk=3, ingest="polar")
        np.testing.assert_allclose(a.positions, b.positions, atol=2e-2)
