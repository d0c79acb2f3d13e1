"""Native async scan loader: build, ordered prefetch, padding, parity with
the numpy reader."""

import os

import numpy as np
import pytest

from lidar_visual_odometry_tpu.data import kitti
from lidar_visual_odometry_tpu.data.native_loader import NativeScanReader


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("velodyne")
    rng = np.random.default_rng(0)
    scans = []
    for k in range(6):
        n = int(rng.integers(100, 400))
        data = rng.normal(size=(n, 4)).astype(np.float32)
        data.tofile(os.path.join(d, f"{k:06d}.bin"))
        scans.append(data)
    return d, scans


def test_reads_in_order_with_padding(bin_dir):
    d, scans = bin_dir
    reader = NativeScanReader(
        os.path.join(str(d), "%06ld.bin"), n_files=6, capacity=512,
        prefetch=3, threads=3,
    )
    out = list(reader)
    reader.close()
    assert len(out) == 6
    for k, (xyz, mask, refl) in enumerate(out):
        want = scans[k]
        n = want.shape[0]
        assert mask.sum() == n
        np.testing.assert_array_equal(xyz[:n], want[:, :3])
        np.testing.assert_array_equal(refl[:n], want[:, 3])
        assert (xyz[n:] == 0).all() and not mask[n:].any()


def test_capacity_clamp(bin_dir):
    d, scans = bin_dir
    reader = NativeScanReader(
        os.path.join(str(d), "%06ld.bin"), n_files=2, capacity=50
    )
    xyz, mask, _ = reader.next()
    reader.close()
    assert mask.sum() == 50
    np.testing.assert_array_equal(xyz, scans[0][:50, :3])


def test_matches_numpy_reader(bin_dir):
    d, scans = bin_dir
    path = os.path.join(str(d), "000003.bin")
    np.testing.assert_array_equal(kitti.read_velodyne_bin(path), scans[3])
