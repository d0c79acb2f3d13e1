"""Scan-to-scan lidar odometry (≡ laserOdometry node, TPU-native).

One jitted device program per frame replacing the reference's
re-associate → Ceres loop (``src/laserOdometry.cpp:364-578``):

* outer loop (static count): batched corner/surf association against the
  previous frame's less-sharp/less-flat clouds via MXU distance matrices with
  the exact ring-window predicates,
* inner loop: full Gauss-Newton — analytic point-to-line / point-to-plane
  Jacobians, Huber(0.1) IRLS weights, 6×6 damped Cholesky solve,
  left-multiplicative pose update.

World pose integrates as ``t_w += q_w·t_inc; q_w *= q_inc``
(``laserOdometry.cpp:581-582``). The host-side ``LidarOdometry`` wrapper keeps
the previous frame's features on device and hands frames through.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import gn, knn, lidar_factors as lf, se3
from ..ops.features import FeatureCloud, ScanFeatures
from ..utils.config import OdometryConfig


class OdometryState(NamedTuple):
    pose_w: se3.Pose          # world ← current frame
    pose_rel: se3.Pose        # last ← current (motion prior for next frame)
    prev_less_sharp: FeatureCloud
    prev_less_flat: FeatureCloud


def _deskew_s(fc: FeatureCloud, deskew: bool) -> jax.Array:
    return fc.rel_time if deskew else jnp.ones_like(fc.rel_time)


def _identity_reduce(H, g):
    return H, g


def scan_to_scan_impl(
    curr: ScanFeatures,
    prev_less_sharp: FeatureCloud,
    prev_less_flat: FeatureCloud,
    init_rel: se3.Pose,
    cfg: OdometryConfig,
    reduce_fn=_identity_reduce,
) -> se3.Pose:
    """Estimate T_last_curr starting from ``init_rel`` (constant-velocity
    prior — the reference warm-starts from the previous solution by keeping
    para_q/para_t across frames).

    ``reduce_fn(H, g)`` hooks cross-device reduction: the distributed layer
    shards current-frame features over the mesh and psums the normal
    equations here (parallel/sharded_odometry.py)."""

    sharp = curr.sharp
    flat = curr.flat
    s_sharp = _deskew_s(sharp, cfg.deskew)
    s_flat = _deskew_s(flat, cfg.deskew)

    # Candidate clouds keep their natural ring-major block layout from feature
    # extraction — association streams ring blocks instead of materializing the
    # full (Q, C) distance matrix (ops/knn.py ring_top2).
    R = cfg.n_rings
    ls_blocks = prev_less_sharp.xyz.reshape(R, -1, 3)
    ls_mask = prev_less_sharp.mask.reshape(R, -1)
    lfb = prev_less_flat.xyz.reshape(R, -1, 3)
    lf_mask = prev_less_flat.mask.reshape(R, -1)

    def outer(pose, _):
        return _outer_once(pose), None

    def _outer_once(pose):
        # --- data association at the current pose estimate ---
        # coords-emitting association: correspondence points come back as
        # coordinates (gathered in-kernel on TPU), no index gathers here
        q_corner = lf._transform_deskewed(pose, sharp.xyz, s_sharp)
        ea = knn.associate_edges_coords(
            q_corner, sharp.mask, ls_blocks, ls_mask,
            dist_sq_threshold=cfg.dist_sq_threshold,
            nearby_scan=cfg.nearby_scan,
        )
        q_surf = lf._transform_deskewed(pose, flat.xyz, s_flat)
        pa = knn.associate_planes_coords(
            q_surf, flat.mask, lfb, lf_mask,
            dist_sq_threshold=cfg.dist_sq_threshold,
            nearby_scan=cfg.nearby_scan,
        )
        edge = lf.EdgeCorr(
            p=sharp.xyz, a=ea.a, b=ea.b, s=s_sharp, mask=ea.valid
        )
        plane = lf.PlaneCorr(
            p=flat.xyz, j=pa.j, l=pa.l, m=pa.m, s=s_flat, mask=pa.valid
        )

        # --- Gauss-Newton at fixed correspondences ---
        use_fused = (
            jax.default_backend() == "tpu"
            and not cfg.deskew
            and reduce_fn is _identity_reduce
        )
        if use_fused:
            # single fused Pallas kernel: all gn_iters VMEM-resident
            # (ops/pallas_gn.py). Point layout (3, N), weights (1, N).
            from ..ops import pallas_gn

            q, t = pallas_gn.gn_inner_loop(
                pose.q, pose.t,
                edge.p.T, edge.a.T, edge.b.T,
                edge.mask.astype(jnp.float32)[None],
                plane.p.T, plane.j.T, plane.l.T, plane.m.T,
                plane.mask.astype(jnp.float32)[None],
                n_iters=cfg.gn_iters,
                huber_delta=cfg.huber_delta,
            )
            return se3.Pose(q, t)

        def inner(pose, _):
            re, Je = lf.edge_residuals(pose, edge)
            rp, Jp = lf.plane_residuals(pose, plane)
            we = gn.huber_weight(jnp.linalg.norm(re, axis=-1), cfg.huber_delta)
            wp = gn.huber_weight(jnp.abs(rp[..., 0]), cfg.huber_delta)
            He, ge = gn.accumulate(re, Je, we, edge.mask)
            Hp, gp = gn.accumulate(rp, Jp, wp, plane.mask)
            H, g = reduce_fn(He + Hp, ge + gp)
            delta = gn.solve_damped(H, g)
            return gn.gn_update_pose(pose, delta), None

        pose, _ = jax.lax.scan(inner, pose, None, length=cfg.gn_iters)
        return pose

    if cfg.outer_tol > 0.0:
        # Adaptive re-association (lax.while_loop, ≤ outer_iters rounds,
        # early exit when one round no longer moves the pose): the warm-
        # started solver converges in 2-3 rounds on smooth motion, but a
        # sharp turn ONSET (constant-velocity prior stale by >10°) needs the
        # reference's full 10 rounds (laserOdometry.cpp:364) — measured on
        # the out-and-back regime, 5 fixed rounds lock in a 9.6° yaw error
        # at the first turn frame (mapped ATE 0.83 m) while 10 recover it
        # (0.017 m). The adaptive loop pays for extra rounds only on the
        # frames that need them.
        def cond(carry):
            pose, pq, pt, i = carry
            dq = jnp.max(jnp.abs(pose.q - pq * jnp.sign(
                jnp.sum(pose.q * pq))))
            dt = jnp.max(jnp.abs(pose.t - pt))
            moved = (2.0 * dq > cfg.outer_tol) | (dt > cfg.outer_tol)
            return (i < cfg.outer_iters) & ((i < 2) | moved)

        def body(carry):
            pose, _, _, i = carry
            return (_outer_once(pose), pose.q, pose.t, i + 1)

        pose, _, _, _ = jax.lax.while_loop(
            cond, body,
            (init_rel, init_rel.q, init_rel.t, jnp.asarray(0, jnp.int32)),
        )
        return pose

    pose, _ = jax.lax.scan(outer, init_rel, None, length=cfg.outer_iters)
    return pose


@partial(jax.jit, static_argnames=("cfg",))
def scan_to_scan(
    curr: ScanFeatures,
    prev_less_sharp: FeatureCloud,
    prev_less_flat: FeatureCloud,
    init_rel: se3.Pose,
    cfg: OdometryConfig,
) -> se3.Pose:
    return scan_to_scan_impl(curr, prev_less_sharp, prev_less_flat, init_rel, cfg)


@jax.jit
def integrate_world(pose_w: se3.Pose, rel: se3.Pose) -> se3.Pose:
    """T_w_curr = T_w_last ∘ T_last_curr (laserOdometry.cpp:581-582)."""
    return se3.se3_compose(pose_w, rel)


def init_state(feats: ScanFeatures) -> OdometryState:
    ident = se3.identity_pose()
    return OdometryState(ident, ident, feats.less_sharp, feats.less_flat)


def odometry_step(
    state: OdometryState, feats: ScanFeatures, cfg: OdometryConfig,
    init_rel: se3.Pose | None = None,
) -> tuple[OdometryState, se3.Pose]:
    """One frame: solve T_last_curr (warm-started), integrate world pose,
    roll feature state. Pure function — composable into fused/scanned
    programs.

    init_rel overrides the constant-velocity warm start (state.pose_rel) —
    the coupled cam-lidar mode feeds the visual relative pose here (the
    reference's dormant coupling, CamLidarProcess.cpp:278-307)."""
    rel = scan_to_scan_impl(
        feats, state.prev_less_sharp, state.prev_less_flat,
        state.pose_rel if init_rel is None else init_rel, cfg,
    )
    pose_w = se3.se3_compose(state.pose_w, rel)
    return OdometryState(pose_w, rel, feats.less_sharp, feats.less_flat), pose_w


# Host→device transfer quantization for raw scans: the tunneled-TPU link
# moves ~80 MB/s, so the 12.6 MB/chunk float32 upload dominates the pipeline
# (~220 ms/chunk). uint16 at 3.9 mm resolution (σ≈1.1 mm, ~20× below lidar
# noise) halves the bytes; validity travels as one count per frame instead of
# a (N,) bool plane (points arrive front-packed from the loader).
QUANT_SCALE = 256.0 / 65536.0     # 3.9 mm over ±128 m (max_range is 120 m)
QUANT_OFFSET = -128.0


def quantize_scan(pts, capacity: int):
    """Host-side: (n, ≥3) float scan → ((capacity, 3) uint16, count)."""
    import numpy as np

    n = min(pts.shape[0], capacity)
    out = np.empty((capacity, 3), np.uint16)
    q = np.clip(
        (pts[:n, :3].astype(np.float32) - QUANT_OFFSET) / QUANT_SCALE,
        0.0, 65535.0,
    )
    out[:n] = (q + 0.5).astype(np.uint16)
    return out, np.int32(n)


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg"))
def odometry_chunk_quantized(
    state: OdometryState,
    qpts: jax.Array,      # (K, N, 3) uint16
    counts: jax.Array,    # (K,) int32 — points per frame (front-packed)
    lidar_cfg,
    odom_cfg: OdometryConfig,
) -> tuple[OdometryState, se3.Pose]:
    """odometry_chunk over quantized scans: dequantize on device, mask from
    counts. Padding garbage beyond count is masked before any use."""
    from .scan_registration import register_scan_impl

    idx = jnp.arange(qpts.shape[1], dtype=jnp.int32)

    def step(state, frame):
        qp, n = frame
        xyz = qp.astype(jnp.float32) * QUANT_SCALE + QUANT_OFFSET
        mask = idx < n
        feats = register_scan_impl(xyz, mask, lidar_cfg).features
        state, pose_w = odometry_step(state, feats, odom_cfg)
        return state, pose_w

    return jax.lax.scan(step, state, (qpts, counts))


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg"))
def odometry_chunk_polar(
    state: OdometryState,
    imgs: jax.Array,      # (K, R, W, 2) uint16 (pointcloud.pack_polar_scan)
    lidar_cfg,
    odom_cfg: OdometryConfig,
) -> tuple[OdometryState, se3.Pose]:
    """odometry_chunk over packed polar images: 4 bytes/cell H2D (vs 6 for
    uint16 xyz at capacity) and the decode lands on the compacted grid —
    the transfer-bound deployment mode (see pointcloud.pack_polar_scan)."""
    from .scan_registration import register_polar_impl

    def step(state, img):
        feats = register_polar_impl(img, lidar_cfg).features
        state, pose_w = odometry_step(state, feats, odom_cfg)
        return state, pose_w

    return jax.lax.scan(step, state, imgs)


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg"))
def odometry_chunk(
    state: OdometryState,
    scans: jax.Array,     # (K, N, 3)
    masks: jax.Array,     # (K, N)
    lidar_cfg,
    odom_cfg: OdometryConfig,
) -> tuple[OdometryState, se3.Pose]:
    """Process K frames in ONE device program: lax.scan over frames, each
    iteration = feature extraction + scan-to-scan GN.

    This amortizes host→device dispatch (which costs ~30 ms/RPC in tunneled
    environments and ≈50 µs even on local PCIe) over the whole chunk — the
    TPU-native replacement for the reference's per-frame ROS hand-offs.
    Returns (final state, stacked world poses (K, ...)).
    """
    from .scan_registration import register_scan_impl

    def step(state, frame):
        scan, mask = frame
        feats = register_scan_impl(scan, mask, lidar_cfg).features
        state, pose_w = odometry_step(state, feats, odom_cfg)
        return state, pose_w

    return jax.lax.scan(step, state, (scans, masks))


class LidarOdometry:
    """Host-side frame-to-frame driver (state lives on device)."""

    def __init__(self, cfg: OdometryConfig = OdometryConfig()):
        self.cfg = cfg
        self.state: OdometryState | None = None

    def process(
        self, feats: ScanFeatures, init_rel: se3.Pose | None = None
    ) -> tuple[se3.Pose, se3.Pose]:
        """Feed one frame's features; returns (world pose, relative pose).

        init_rel overrides the constant-velocity warm start (IMU-predicted
        or visual relative pose — the coupling consumers)."""
        if self.state is None:
            ident = se3.identity_pose()
            self.state = OdometryState(
                ident, ident, feats.less_sharp, feats.less_flat
            )
            return ident, ident

        st = self.state
        rel = scan_to_scan(
            feats, st.prev_less_sharp, st.prev_less_flat,
            st.pose_rel if init_rel is None else init_rel, self.cfg,
        )
        pose_w = integrate_world(st.pose_w, rel)
        self.state = OdometryState(pose_w, rel, feats.less_sharp, feats.less_flat)
        return pose_w, rel
