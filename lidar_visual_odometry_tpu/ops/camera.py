"""Pinhole camera model with radial-tangential distortion.

Batched replacement for the reference's ``CameraModel``/``PinholeModel``
(``src/vloam/PinholeModel.cpp``): projection ``xyz_to_uv`` (``:98-153``),
cloud projection ``pointcloud_to_uv`` (``:155-190``), bounds test
``is_in_image`` (``:79-91``) — all over (..., 3) tensors. Undistortion maps
(``:27-28``) are replaced by distortion-aware projection plus an iterative
``undistort_points`` (KITTI odometry images are rectified, so the distortion
path is usually zeros).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Pinhole:
    """Intrinsics pytree: fx/fy/cx/cy/dist trace as arrays; width/height are
    static aux data (they parameterize shapes, e.g. pyramid levels)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int
    dist: jax.Array  # (5,) k1 k2 p1 p2 k3

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy, self.dist), (
            self.width, self.height,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        fx, fy, cx, cy, dist = children
        return cls(fx, fy, cx, cy, aux[0], aux[1], dist)

    def _replace(self, **kw) -> "Pinhole":
        return replace(self, **kw)

    @staticmethod
    def from_config(cam) -> "Pinhole":
        return Pinhole(
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy),
            cam.width, cam.height,
            jnp.asarray([cam.d0, cam.d1, cam.d2, cam.d3, cam.d4], jnp.float32),
        )


def distort(cam: Pinhole, xn: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(cam: Pinhole, xyz: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points (..., 3) → pixel (..., 2) + in-front mask."""
    z = xyz[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    xn = xyz[..., :2] / safe_z[..., None]
    xd = distort(cam, xn)
    uv = jnp.stack(
        [cam.fx * xd[..., 0] + cam.cx, cam.fy * xd[..., 1] + cam.cy], axis=-1
    )
    return uv, z > 1e-6


def normalized(cam: Pinhole, uv: jax.Array) -> jax.Array:
    """Pixel (..., 2) → normalized plane coords (assumes rectified input;
    matches featureTracking's (p−c)/f output convention,
    featureTracking.cpp:286-290)."""
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )


def is_in_image(
    cam: Pinhole, uv: jax.Array, boundary: float = 0.0, scale: float = 1.0
) -> jax.Array:
    """Bounds test at pyramid level ``scale`` (PinholeModel.cpp:79-91)."""
    w = cam.width * scale
    h = cam.height * scale
    return (
        (uv[..., 0] >= boundary)
        & (uv[..., 0] < w - boundary)
        & (uv[..., 1] >= boundary)
        & (uv[..., 1] < h - boundary)
    )


def undistort_points(cam: Pinhole, uv: jax.Array, iters: int = 5) -> jax.Array:
    """Iteratively invert the distortion for pixel coords (..., 2)."""
    xn0 = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )

    def body(i, xn):
        xd = distort(cam, xn)
        return xn - (xd - xn0)

    xn = jax.lax.fori_loop(0, iters, body, xn0)
    return jnp.stack(
        [cam.fx * xn[..., 0] + cam.cx, cam.fy * xn[..., 1] + cam.cy], axis=-1
    )


def undistort_rectify_map(cam: Pinhole) -> jax.Array:
    """(H, W, 2) source-pixel lookup map for image undistortion
    (≡ ``cv::initUndistortRectifyMap`` with new-K = K,
    ``PinholeModel.cpp:27-28``): for each *undistorted* output pixel,
    the distorted source location to sample. Compute once per camera.
    """
    ys = jnp.arange(cam.height, dtype=jnp.float32)
    xs = jnp.arange(cam.width, dtype=jnp.float32)
    u, v = jnp.meshgrid(xs, ys)
    xn = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy], axis=-1)
    xd = distort(cam, xn)
    return jnp.stack(
        [cam.fx * xd[..., 0] + cam.cx, cam.fy * xd[..., 1] + cam.cy], axis=-1
    )


def undistort_image(img: jax.Array, map_uv: jax.Array) -> jax.Array:
    """Bilinear remap (≡ ``PinholeModel::undistort_image``,
    ``PinholeModel.cpp:192-200``, i.e. ``cv::remap`` INTER_LINEAR)."""
    from .image import bilinear

    return bilinear(img, map_uv)
