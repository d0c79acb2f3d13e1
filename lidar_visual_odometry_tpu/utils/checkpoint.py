"""Checkpoint / resume for long odometry runs.

The reference has no checkpointing at all (SURVEY.md §5: "a crash loses the
run"); this module adds it: the odometry feature state, the mapping cube
store, the drift correction, and the trajectory so far snapshot to one
``.npz`` — a run can resume mid-sequence, which matters once multi-host runs
make restarts expensive.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..models.lidar_odometry import OdometryState
from ..ops import se3
from ..ops.features import FeatureCloud


def _flatten_fc(prefix: str, fc: FeatureCloud, out: dict) -> None:
    out[prefix + "_xyz"] = np.asarray(fc.xyz)
    out[prefix + "_ring"] = np.asarray(fc.ring)
    out[prefix + "_rel_time"] = np.asarray(fc.rel_time)
    out[prefix + "_mask"] = np.asarray(fc.mask)


def _unflatten_fc(prefix: str, data) -> FeatureCloud:
    return FeatureCloud(
        jnp.asarray(data[prefix + "_xyz"]),
        jnp.asarray(data[prefix + "_ring"]),
        jnp.asarray(data[prefix + "_rel_time"]),
        jnp.asarray(data[prefix + "_mask"]),
    )


def save_checkpoint(
    path: str,
    *,
    frame_idx: int,
    odom_state: OdometryState,
    trajectory_q: np.ndarray,
    trajectory_t: np.ndarray,
    mapper=None,
) -> None:
    out: dict = {
        "frame_idx": np.asarray(frame_idx),
        "pose_w_q": np.asarray(odom_state.pose_w.q),
        "pose_w_t": np.asarray(odom_state.pose_w.t),
        "pose_rel_q": np.asarray(odom_state.pose_rel.q),
        "pose_rel_t": np.asarray(odom_state.pose_rel.t),
        "traj_q": np.asarray(trajectory_q),
        "traj_t": np.asarray(trajectory_t),
    }
    _flatten_fc("prev_ls", odom_state.prev_less_sharp, out)
    _flatten_fc("prev_lf", odom_state.prev_less_flat, out)

    if mapper is not None:
        out["map_corr_q"] = np.asarray(mapper.correction.q)
        out["map_corr_t"] = np.asarray(mapper.correction.t)
        out["map_initialized"] = np.asarray(mapper.initialized)
        for name, store in (
            ("corner", mapper.corner_map), ("surf", mapper.surf_map)
        ):
            keys = np.asarray(sorted(store.cubes.keys()), np.int64).reshape(-1, 3)
            out[f"map_{name}_keys"] = keys
            sizes = []
            pts = []
            for k in map(tuple, keys):
                c = store.cubes[k]
                sizes.append(c.shape[0])
                pts.append(c)
            out[f"map_{name}_sizes"] = np.asarray(sizes, np.int64)
            out[f"map_{name}_points"] = (
                np.concatenate(pts) if pts else np.zeros((0, 3), np.float32)
            )
    np.savez_compressed(path, **out)


def load_checkpoint(path: str, mapper=None):
    """Returns (frame_idx, OdometryState, traj_q, traj_t); restores
    ``mapper`` in place when given."""
    data = np.load(path)
    state = OdometryState(
        pose_w=se3.Pose(jnp.asarray(data["pose_w_q"]), jnp.asarray(data["pose_w_t"])),
        pose_rel=se3.Pose(
            jnp.asarray(data["pose_rel_q"]), jnp.asarray(data["pose_rel_t"])
        ),
        prev_less_sharp=_unflatten_fc("prev_ls", data),
        prev_less_flat=_unflatten_fc("prev_lf", data),
    )
    if mapper is not None and "map_corr_q" in data:
        mapper.correction = se3.Pose(
            jnp.asarray(data["map_corr_q"]), jnp.asarray(data["map_corr_t"])
        )
        mapper.initialized = bool(data["map_initialized"])
        for name, store in (
            ("corner", mapper.corner_map), ("surf", mapper.surf_map)
        ):
            store.cubes.clear()
            keys = data[f"map_{name}_keys"]
            sizes = data[f"map_{name}_sizes"]
            pts = data[f"map_{name}_points"]
            off = 0
            for k, n in zip(map(tuple, keys), sizes):
                store.cubes[k] = pts[off:off + n]
                off += n
    return (
        int(data["frame_idx"]),
        state,
        data["traj_q"],
        data["traj_t"],
    )
