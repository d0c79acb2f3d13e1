"""Distributed layer tests on the 8-device virtual CPU mesh:
sharded odometry must match the single-device solve bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.data import synthetic
from lidar_visual_odometry_tpu.models import lidar_odometry as lo
from lidar_visual_odometry_tpu.models import scan_registration as sr
from lidar_visual_odometry_tpu.ops import pointcloud as pc, se3
from lidar_visual_odometry_tpu.parallel import sharded_odometry as so
from lidar_visual_odometry_tpu.utils.config import LidarConfig, OdometryConfig


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    seq = synthetic.SyntheticSequence(n_frames=2, width=900, noise=0.005)
    cfg = LidarConfig(azimuth_bins=1024)
    ocfg = OdometryConfig(outer_iters=4, gn_iters=4)
    regs = []
    for k in range(2):
        xyz, mask = pc.pad_points(seq.scan(k), 131072)
        regs.append(sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg))

    single = lo.scan_to_scan(
        regs[1].features,
        regs[0].features.less_sharp,
        regs[0].features.less_flat,
        se3.identity_pose(),
        ocfg,
    )
    mesh = so.make_mesh()
    sharded = so.sharded_scan_to_scan(
        mesh,
        regs[1].features,
        regs[0].features.less_sharp,
        regs[0].features.less_flat,
        se3.identity_pose(),
        ocfg,
    )
    np.testing.assert_allclose(
        np.asarray(single.t), np.asarray(sharded.t), atol=1e-4
    )
    qd = np.abs(np.asarray(single.q) @ np.asarray(sharded.q))
    assert qd > 1 - 1e-6
