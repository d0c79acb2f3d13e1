"""Multi-process fleet worker (spawned by test_multiprocess.py).

Joins a ``jax.distributed`` CPU process group (N processes × 4 virtual
devices each), builds a deterministic fixture identical on every process,
and runs all three distributed stages over the GLOBAL mesh:

* sharded scan-to-scan odometry (psum-reduced normal equations)
* sharded scan-to-map refinement (per-shard 5-NN + all_gather merge)
* points-sharded window BA

Prints one JSON line with the resulting poses; the parent compares across
processes and against the single-process reference values.
"""

import json
import sys

port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from lidar_visual_odometry_tpu.parallel import multihost as mh  # noqa: E402

mh.initialize(f"localhost:{port}", nproc, pid, cpu_devices_per_process=4)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from lidar_visual_odometry_tpu.models.lidar_mapping import LocalMap  # noqa: E402
from lidar_visual_odometry_tpu.ops import camera, se3  # noqa: E402
from lidar_visual_odometry_tpu.ops.features import (  # noqa: E402
    FeatureCloud, ScanFeatures,
)
from lidar_visual_odometry_tpu.ops.pointcloud import PointBatch  # noqa: E402
from lidar_visual_odometry_tpu.parallel import (  # noqa: E402
    sharded_ba, sharded_mapping as sm, sharded_odometry as so,
)
from lidar_visual_odometry_tpu.utils.config import (  # noqa: E402
    MappingConfig, OdometryConfig,
)

assert jax.process_count() == nproc, jax.process_count()
N_DEV = len(jax.devices())
mesh = mh.global_mesh()


def tiny_features(n_sharp, n_ls, n_flat, n_lf, seed):
    rng = np.random.default_rng(seed)

    def fc(n, pts):
        return FeatureCloud(
            pts.astype(np.float32),
            rng.integers(0, 64, size=n).astype(np.int32),
            rng.uniform(size=n).astype(np.float32),
            np.ones((n,), bool),
        )

    base = rng.uniform(-20, 20, size=(n_lf, 3))
    return ScanFeatures(
        fc(n_sharp, base[:n_sharp] + rng.normal(scale=0.02, size=(n_sharp, 3))),
        fc(n_ls, base[:n_ls] + rng.normal(scale=0.02, size=(n_ls, 3))),
        fc(n_flat, base[:n_flat] + rng.normal(scale=0.02, size=(n_flat, 3))),
        fc(n_lf, base + rng.normal(scale=0.02, size=(n_lf, 3))),
    )


out = {"pid": pid, "n_dev": N_DEV}

# ---- sharded odometry: sharp/flat queries split over the global axis ----
curr = tiny_features(16 * N_DEV, 64 * N_DEV, 32 * N_DEV, 128 * N_DEV, seed=1)
prev = tiny_features(16 * N_DEV, 64 * N_DEV, 32 * N_DEV, 128 * N_DEV, seed=0)
curr_g = ScanFeatures(
    mh.shard_batch(mesh, curr.sharp),
    mh.replicate(mesh, curr.less_sharp),
    mh.shard_batch(mesh, curr.flat),
    mh.replicate(mesh, curr.less_flat),
)
prev_ls = mh.replicate(mesh, prev.less_sharp)
prev_lf = mh.replicate(mesh, prev.less_flat)
ident = mh.replicate(mesh, se3.identity_pose())

pose = so.sharded_scan_to_scan(
    mesh, curr_g, prev_ls, prev_lf, ident,
    OdometryConfig(outer_iters=2, gn_iters=2),
)
out["odo_t"] = np.asarray(jax.device_get(pose.t)).tolist()

# ---- sharded mapping: submap capacity axis split over the global axis ----
# structured geometry so line/plane fits accept: corners on vertical posts,
# surfs on the ground plane; queries are the same geometry shifted 5 cm so
# the refined pose is a NONZERO correction both processes must agree on
rng = np.random.default_rng(2)
C = 256 * N_DEV
gx = rng.uniform(-15, 15, C // 8)
gy = rng.uniform(-15, 15, C // 8)
corner_map = np.stack(
    [np.repeat(gx, 8), np.repeat(gy, 8),
     np.tile(np.linspace(0.0, 2.8, 8), C // 8)], -1
).astype(np.float32)
surf_map = np.stack(
    [rng.uniform(-15, 15, C), rng.uniform(-15, 15, C), np.zeros(C)], -1
).astype(np.float32)
local = LocalMap(
    PointBatch(*mh.shard_batch(mesh, (corner_map, np.ones((C,), bool)))),
    PointBatch(*mh.shard_batch(mesh, (surf_map, np.ones((C,), bool)))),
)
shift = np.asarray([0.05, -0.03, 0.04], np.float32)
cq = corner_map[: 64 * N_DEV] + shift
sq = surf_map[: 64 * N_DEV] + shift
mpose = sm.sharded_mapping_step(
    mesh,
    mh.replicate(mesh, jnp.asarray(cq)),
    mh.replicate(mesh, jnp.ones((cq.shape[0],), bool)),
    mh.replicate(mesh, jnp.asarray(sq)),
    mh.replicate(mesh, jnp.ones((sq.shape[0],), bool)),
    local, ident, MappingConfig(outer_iters=2, gn_iters=4),
)
out["map_t"] = np.asarray(jax.device_get(mpose.t)).tolist()

# ---- points-sharded window BA ----
K, Pp = 3, 16 * N_DEV
cam = mh.replicate(mesh, camera.Pinhole(
    jnp.float32(60.0), jnp.float32(60.0), jnp.float32(64.0),
    jnp.float32(32.0), 128, 64, jnp.zeros(5),
))
pyrs = tuple(
    mh.replicate(
        mesh, jnp.asarray(rng.random((K, 64 >> l, 128 >> l)).astype(np.float32))
    )
    for l in range(2)
)
pts = np.stack(
    [rng.uniform(-2, 2, (Pp, 3)) + [0, 0, 6] for _ in range(K)]
).astype(np.float32)
poses = se3.Pose(
    np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (K, 1)),
    rng.normal(scale=0.1, size=(K, 3)).astype(np.float32),
)
refined = sharded_ba.sharded_refine(
    mesh,
    pyrs,
    mh.shard_batch(mesh, pts, axis=1),
    mh.shard_batch(mesh, np.ones((K, Pp), bool), axis=1),
    mh.replicate(mesh, poses),
    cam, n_iters=2, level=0,
)
out["ba_t"] = np.asarray(jax.device_get(refined.t)).tolist()

for v in ("odo_t", "map_t", "ba_t"):
    assert np.isfinite(out[v]).all(), out
print("MPRESULT " + json.dumps(out), flush=True)
