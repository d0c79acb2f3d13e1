"""Keyframe data model for direct tracking (≡ Frame/Keyframe/KeyframeWindow).

A keyframe holds an image pyramid and a fixed-capacity set of gradient-selected
3-D points (camera frame) with reference intensities. The reference selects
points by bucketing the projected lidar cloud into runs of 10 candidates and
keeping the argmax gradient magnitude if it exceeds 6.25/255²
(``src/vloam/Keyframe.cpp:32-94``); that bucketing is reproduced here as a
reshape + segment-argmax.

``KeyframeWindow`` is the 5-slot FIFO of the window BA
(``KeyframeWindow.cpp:23-32``), kept as stacked tensors so the photometric
bundle adjustment vmaps over (host, target) pairs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import image, se3


class Keyframe(NamedTuple):
    pyramid: tuple            # tuple of (H/2^l, W/2^l) images
    points: jax.Array         # (P, 3) selected points, keyframe camera frame
    point_mask: jax.Array     # (P,)
    pose_w: se3.Pose          # Twc


GRAD_GATE = 6.25 / (255.0 * 255.0)  # Keyframe.cpp:60 (images in [0,1])


@partial(jax.jit, static_argnames=("cap", "bucket"))
def select_points(
    img: jax.Array,
    cam,
    pts_cam: jax.Array,
    pts_mask: jax.Array,
    *,
    cap: int = 2048,
    bucket: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Gradient-bucket sampling of the projected cloud (Keyframe.cpp:32-94).

    Scans the candidate list in buckets of ``bucket``; per bucket keeps the
    max-|∇I|² candidate above the gate. Returns (points (cap, 3), mask).
    """
    gx, gy = image.gradients(img)
    gmag = gx * gx + gy * gy

    uv, in_front = cam_ops.project(cam, pts_cam)
    ok = pts_mask & in_front & cam_ops.is_in_image(cam, uv, boundary=2.0)
    g = jnp.where(ok, image.bilinear(gmag, uv), -1.0)

    n = pts_cam.shape[0]
    n_buckets = n // bucket
    g_b = g[: n_buckets * bucket].reshape(n_buckets, bucket)
    best = jnp.argmax(g_b, axis=1)
    best_g = jnp.take_along_axis(g_b, best[:, None], axis=1)[:, 0]
    sel_idx = jnp.arange(n_buckets) * bucket + best
    sel_ok = best_g > GRAD_GATE

    # compact selected to the front, pad to cap
    order = jnp.argsort(~sel_ok, stable=True)
    sel_idx = sel_idx[order][:cap]
    sel_ok = sel_ok[order][:cap]
    pts = pts_cam[sel_idx]
    if n_buckets < cap:
        pad = cap - n_buckets
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        sel_ok = jnp.concatenate([sel_ok, jnp.zeros((pad,), bool)])
    return pts, sel_ok


def make_keyframe(
    img: jax.Array, cam, pts_cam: jax.Array, pts_mask: jax.Array,
    pose_w: se3.Pose, *, levels: int = 4, cap: int = 2048,
) -> Keyframe:
    pyr = tuple(image.build_pyramid(img, levels))
    pts, mask = select_points(img, cam, pts_cam, pts_mask, cap=cap)
    return Keyframe(pyr, pts, mask, pose_w)


class KeyframeWindow:
    """Host-side FIFO of the last N keyframes (stacked for BA)."""

    def __init__(self, size: int = 5):
        self.size = size
        self.frames: list[Keyframe] = []

    def add(self, kf: Keyframe) -> None:
        self.frames.append(kf)
        if len(self.frames) > self.size:
            self.frames.pop(0)

    def __len__(self) -> int:
        return len(self.frames)

    def stacked(self):
        """Stack poses/points/pyramids for the BA kernel (requires full
        window)."""
        assert len(self.frames) == self.size
        pyrs = tuple(
            jnp.stack([kf.pyramid[l] for kf in self.frames])
            for l in range(len(self.frames[0].pyramid))
        )
        return (
            pyrs,
            jnp.stack([kf.points for kf in self.frames]),
            jnp.stack([kf.point_mask for kf in self.frames]),
            se3.Pose(
                jnp.stack([kf.pose_w.q for kf in self.frames]),
                jnp.stack([kf.pose_w.t for kf in self.frames]),
            ),
        )

    def visible_ratio(self, kf_a: Keyframe, kf_b: Keyframe, cam) -> float:
        """Fraction of kf_b's points visible from kf_a (Keyframe.cpp:97-131),
        the keyframe-creation criterion."""
        T_ab = se3.se3_compose(se3.se3_inverse(kf_a.pose_w), kf_b.pose_w)
        pts_a = se3.se3_apply(T_ab, kf_b.points)
        uv, front = cam_ops.project(cam, pts_a)
        vis = kf_b.point_mask & front & cam_ops.is_in_image(cam, uv)
        denom = jnp.maximum(jnp.sum(kf_b.point_mask), 1)
        return float(jnp.sum(vis) / denom)


class KeyframeDB:
    """Append-only keyframe archive (≡ KeyframeDB, ``KeyframeDB.cpp:19-55``).

    The reference keeps every keyframe ever created in a vector next to the
    FIFO window and offers a debug view projecting the accumulated clouds
    into the latest keyframe's image. Here the archive stores poses + point
    clouds host-side (numpy — it grows unboundedly like the reference's),
    and the debug view is a batched reprojection returning the accumulated
    (u, v) splats instead of a cv window (the zero-display analog of
    ``show_image_with_accum_points``).
    """

    def __init__(self):
        self.poses: list[se3.Pose] = []
        self.points: list = []          # np (N, 3) camera-frame clouds
        self.masks: list = []

    def add(self, kf: Keyframe) -> None:
        import numpy as np

        self.poses.append(kf.pose_w)
        self.points.append(np.asarray(kf.points))
        self.masks.append(np.asarray(kf.point_mask))

    def __len__(self) -> int:
        return len(self.poses)

    def accum_points_in_latest(
        self, cam, num_keyframe: int = 5, level: int = 0
    ):
        """Project the last ``num_keyframe`` archived clouds into the latest
        keyframe's image plane (KeyframeDB.cpp:27-48). Returns (uv (M, 2)
        at the given pyramid level, valid (M,)) — render/plot host-side."""
        import numpy as np

        assert self.poses, "empty archive"
        T_wl = self.poses[-1]
        scale = 0.5 ** level
        uvs, oks = [], []
        for pose, pts, m in zip(
            self.poses[-num_keyframe:], self.points[-num_keyframe:],
            self.masks[-num_keyframe:],
        ):
            T_li = se3.se3_compose(se3.se3_inverse(T_wl), pose)
            pts_l = se3.se3_apply(T_li, jnp.asarray(pts))
            uv, front = cam_ops.project(cam, pts_l)
            ok = jnp.asarray(m) & front & cam_ops.is_in_image(
                cam, uv, boundary=2.0
            )
            uvs.append(np.asarray(uv) * scale)
            oks.append(np.asarray(ok))
        return np.concatenate(uvs), np.concatenate(oks)
