"""Visual odometry frontend (≡ featureTracking + Frontend::trackfeature).

DEMO-style sparse visual odometry with lidar depth association, restructured
for TPU: a fixed-capacity feature table (padded slots + active mask) replaces
the reference's id-keyed hash maps (``Frontend.cpp:188-515``), and every
per-feature loop becomes a batched tensor op:

* KLT tracking with reverse check → ops/lk.py (``featureTracking.cpp:203-237``)
* per-subregion FAST replenishment → dense score map + per-cell top-k into
  free slots (``featureTracking.cpp:300-385``)
* depth association: 3-NN in the "10-plane" depth cloud
  ``(10·x/z, 10·y/z, 10)`` + ray/plane intersection depth with the
  reference's min/max gates (``Frontend.cpp:237-301``)
* two-view triangulation fallback against each feature's first observation
  when the baseline exceeds 1 m, fused 0.4/0.6 with propagated depth
  (``Frontend.cpp:303-381``)
* pose GN over epipolar (depthless) + linear-reprojection (depth) residuals
  with the reference's iteration-staged outlier gates
  (``build_InDerectLinearSystem``, ``Frontend.cpp:517-746``), decoupled
  update ``t += δt; q ← δq·q`` (``:436-441``).

Deviation from the reference (deliberate): the reference's epipolar block
writes ``Je_Jt[0]``/``Je_Jtheta[0]`` into all three Jacobian slots
(``Frontend.cpp:595-600``) — a transcription bug that discards two of three
components; this implementation uses the full vectors (cross-checked against
autodiff in tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import gn, image, knn, lk, se3
from ..utils.config import VisualConfig


class FeatureTable(NamedTuple):
    """Fixed-slot feature store (slot index = identity while active)."""

    uv: jax.Array        # (N, 2) pixel coords in the current frame
    active: jax.Array    # (N,) bool
    depth: jax.Array     # (N,) camera z in the current frame; ≤0 = unknown
    start_un: jax.Array  # (N, 2) normalized coords at first observation
    start_q: jax.Array   # (N, 4) Tw at first observation
    start_t: jax.Array   # (N, 3)
    age: jax.Array       # (N,) int32 frames tracked
    flow: jax.Array      # (N, 2) px displacement over the last frame —
                         # temporal LK warm start (flow is frame-coherent;
                         # with the EPS termination the warm-started coarse
                         # levels exit in 1-3 iterations). 0 for new slots =
                         # the reference's cold start (featureTracking.cpp
                         # passes nextPts=prevPts, i.e. zero initial flow)


class DepthCloud(NamedTuple):
    """Camera-frame lidar returns in the 10-plane parameterization."""

    plane10: jax.Array  # (M, 3) = (10·x/z, 10·y/z, 10)
    z: jax.Array        # (M,)
    mask: jax.Array     # (M,)


def empty_table(n: int) -> FeatureTable:
    return FeatureTable(
        uv=jnp.zeros((n, 2), jnp.float32),
        active=jnp.zeros((n,), bool),
        depth=jnp.full((n,), -1.0, jnp.float32),
        start_un=jnp.zeros((n, 2), jnp.float32),
        start_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        start_t=jnp.zeros((n, 3), jnp.float32),
        age=jnp.zeros((n,), jnp.int32),
        flow=jnp.zeros((n, 2), jnp.float32),
    )


def build_depth_cloud(
    pts_cam: jax.Array, mask: jax.Array, min_z: float = 0.3
) -> DepthCloud:
    """Camera-frame cloud → 10-plane cloud (Frame::initialize_pc,
    Frame.cpp:289-352)."""
    z = pts_cam[..., 2]
    ok = mask & (z > min_z)
    safe_z = jnp.where(ok, z, 1.0)
    plane10 = jnp.stack(
        [
            10.0 * pts_cam[..., 0] / safe_z,
            10.0 * pts_cam[..., 1] / safe_z,
            jnp.full_like(z, 10.0),
        ],
        axis=-1,
    )
    return DepthCloud(jnp.where(ok[..., None], plane10, 1e6), z, ok)


def associate_depth(
    un: jax.Array, active: jax.Array, dc: DepthCloud
) -> tuple[jax.Array, jax.Array]:
    """Lidar depth for features at normalized coords un (N, 2).

    3-NN in the 10-plane cloud (gate: nearest < 0.5), ray ∩ 3-point plane
    depth via the closed-form determinant ratio, with the reference's
    spread/clamp gates (Frontend.cpp:245-296). Returns (depth (N,), ok (N,)).
    """
    q = jnp.concatenate(
        [10.0 * un, jnp.full((un.shape[0], 1), 10.0, un.dtype)], axis=-1
    )
    idx, dist = knn.knn(q, dc.plane10, dc.mask, 3)

    z = dc.z[idx]                                   # (N, 3)
    p10 = dc.plane10[idx]                           # (N, 3, 3)
    # recover metric points: (x, y, z) = (p10.x·z/10, p10.y·z/10, z)
    px = p10[..., 0] * z / 10.0
    py = p10[..., 1] * z / 10.0

    x1, x2, x3 = px[:, 0], px[:, 1], px[:, 2]
    y1, y2, y3 = py[:, 0], py[:, 1], py[:, 2]
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    u = un[:, 0]
    v = un[:, 1]
    num = (
        x1 * y2 * z3 - x1 * y3 * z2 - x2 * y1 * z3
        + x2 * y3 * z1 + x3 * y1 * z2 - x3 * y2 * z1
    )
    den = (
        x1 * y2 - x2 * y1 - x1 * y3 + x3 * y1 + x2 * y3 - x3 * y2
        + u * y1 * z2 - u * y2 * z1 - v * x1 * z2 + v * x2 * z1
        - u * y1 * z3 + u * y3 * z1 + v * x1 * z3 - v * x3 * z1
        + u * y2 * z3 - u * y3 * z2 - v * x2 * z3 + v * x3 * z2
    )
    s = num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)

    zmin = jnp.min(z, axis=-1)
    zmax = jnp.max(z, axis=-1)
    s = jnp.where(jnp.isfinite(s), s, z[:, 0])
    s = jnp.where(s - zmax > 0.2, zmax, s)
    s = jnp.where(s - zmin < -0.2, zmin, s)
    ok = (
        active
        & (dist[:, 0] < 0.5)
        & jnp.all(jnp.isfinite(dist), axis=-1)
        & (zmax - zmin <= 2.0)
        & (s > 0)
    )
    return jnp.where(ok, s, 0.0), ok


def triangulate(
    un0: jax.Array,
    start_un: jax.Array,
    T_prev_first: se3.Pose,
) -> tuple[jax.Array, jax.Array]:
    """Two-view depth of un0 (in the previous frame) against the first
    observation, reference formulation (Frontend.cpp:330-357).

    T_prev_first: first-obs frame → previous frame, per feature (batched).
    Returns (depth in previous frame, ok = baseline > 1 & 0.5 < d < 100).
    """
    p0 = jnp.concatenate([un0, jnp.ones_like(un0[..., :1])], axis=-1)
    p1 = jnp.concatenate([start_un, jnp.ones_like(un0[..., :1])], axis=-1)
    p1r = se3.quat_rotate(T_prev_first.q, p1)
    t = T_prev_first.t
    b0 = jnp.sum(t * p0, axis=-1)
    b1 = jnp.sum(t * p1r, axis=-1)
    a00 = jnp.sum(p0 * p0, axis=-1)
    a10 = jnp.sum(p0 * p1r, axis=-1)
    a11 = -jnp.sum(p1r * p1r, axis=-1)
    det = a00 * a11 + a10 * a10          # det([[a00, -a10], [a10, a11]])
    lam0 = (b0 * a11 + a10 * b1) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    lam1 = (a00 * b1 - a10 * b0) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    xm_z = lam0 * p0[..., 2]
    xn_z = t[..., 2] + lam1 * p1r[..., 2]
    depth = 0.5 * (xm_z + xn_z)
    ok = (
        (jnp.linalg.norm(t, axis=-1) > 1.0)
        & (depth > 0.5)
        & (depth < 100.0)
        & jnp.isfinite(depth)
    )
    return depth, ok


def _epipolar_system(pose, un0, un1, w_mask):
    """Correct-Jacobian epipolar rows. pose: T_cur_prev. Returns r, J, w."""
    u1, v1 = un1[:, 0], un1[:, 1]
    t = pose.t
    p0 = jnp.concatenate([un0, jnp.ones_like(un0[:, :1])], axis=-1)
    rp0 = se3.quat_rotate(pose.q[None], p0)
    a = jnp.stack(
        [
            -v1 * t[2] + t[1],
            u1 * t[2] - t[0],
            -u1 * t[1] + v1 * t[0],
        ],
        axis=-1,
    )
    res = jnp.sum(a * rp0, axis=-1)
    # ∂res/∂t = P1 × RP0 ; ∂res/∂θ = −a ᵀ [RP0]×  = (RP0 × a)
    p1 = jnp.stack([u1, v1, jnp.ones_like(u1)], axis=-1)
    J_t = jnp.cross(p1, rp0)
    J_th = jnp.cross(rp0, a)
    # Huber on distance to the epipolar line (Frontend.cpp:580-592)
    epi = jnp.cross(jnp.broadcast_to(t, rp0.shape), rp0)
    d_line = jnp.abs(jnp.sum(p1 * epi, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(epi, axis=-1), 1e-12
    )
    thresh = 0.5 / 760.0
    hw = jnp.where(d_line < thresh, 1.0, thresh / jnp.maximum(d_line, 1e-12))
    w = hw / 0.75 * w_mask
    J = jnp.concatenate([J_t, J_th], axis=-1)
    return res, J, w


def _reproj_system(pose, un0, un1, depth, w_mask, huber_thresh, obs_std):
    """Linear reprojection rows y3, y4 (Frontend.cpp:628-686)."""
    u1, v1 = un1[:, 0], un1[:, 1]
    p0 = jnp.concatenate([un0, jnp.ones_like(un0[:, :1])], axis=-1) * depth[:, None]
    rp0 = se3.quat_rotate(pose.q[None], p0)
    p1 = rp0 + pose.t
    y3 = rp0[:, 0] - u1 * rp0[:, 2] + pose.t[0] - u1 * pose.t[2]
    y4 = rp0[:, 1] - v1 * rp0[:, 2] + pose.t[1] - v1 * pose.t[2]

    invz = 1.0 / jnp.maximum(p1[:, 2], 1e-6)
    e = jnp.sqrt(
        (u1 - p1[:, 0] * invz) ** 2 + (v1 - p1[:, 1] * invz) ** 2
    )
    hw = jnp.where(e < huber_thresh, 1.0, huber_thresh / jnp.maximum(e, 1e-12))
    w = hw / (obs_std * obs_std)
    # degenerate-geometry down-weight (Frontend.cpp:655-659)
    ey = jnp.sqrt(
        (rp0[:, 0] - u1 * rp0[:, 2]) ** 2 + (rp0[:, 1] - v1 * rp0[:, 2]) ** 2
    )
    w = jnp.where(ey < 0.01, w * 0.1, w) * w_mask

    # Jacobians: dRP/dθ = −[RP0]×
    hat = se3.so3_hat(rp0)
    dy3_dth = -(hat[:, 0, :] - u1[:, None] * hat[:, 2, :])
    dy4_dth = -(hat[:, 1, :] - v1[:, None] * hat[:, 2, :])
    ones = jnp.ones_like(u1)
    zeros = jnp.zeros_like(u1)
    J3 = jnp.concatenate(
        [jnp.stack([ones, zeros, -u1], -1), dy3_dth], axis=-1
    )
    J4 = jnp.concatenate(
        [jnp.stack([zeros, ones, -v1], -1), dy4_dth], axis=-1
    )
    return (y3, J3), (y4, J4), w, e * w_mask


def solve_pose(
    pose0: se3.Pose,
    un0: jax.Array,
    un1: jax.Array,
    depth: jax.Array,
    has_depth: jax.Array,
    epi_ok: jax.Array,
    cfg: VisualConfig,
    reduce_fn=None,
) -> se3.Pose:
    """The ≤150-iteration GN of Frontend::trackfeature with staged gates and
    the |δ| < gn_tol early-out (Frontend.cpp:401,443-447) as a while_loop.

    The stage boundaries are the reference's absolute iteration counts
    (epipolar rows fade at 25, outlier rejection engages at 70,
    Frontend.cpp:555,690-693) — with the default gn_iters=150 both stages
    are reachable; a deliberately shortened schedule (< 70) disables the
    rejection, exactly as it would in the reference.

    pose0: initial T_cur_prev (previous frame → current frame).
    reduce_fn: optional (H, g, n_depth, sum_e) -> same — the distributed
    hook (``parallel/sharded_visual.py`` psums partial sums over the mesh;
    rows are feature-parallel, so the reduction is the only cross-shard
    communication, mirroring ``sharded_odometry``).
    """
    epi_stage = 25
    rej_stage = 70

    def body(carry):
        pose, mean_prev, n_depth_prev, it, _ = carry
        # epipolar rows active when translation is significant and either few
        # depth rows or early iterations (Frontend.cpp:555,607)
        use_epi = (
            epi_ok
            & (jnp.linalg.norm(pose.t) > 0.1)
            & ((n_depth_prev < 50) | (it < epi_stage))
        )
        re, Je, we = _epipolar_system(pose, un0, un1, use_epi.astype(jnp.float32))
        we = we * 3.0  # epipolar scale (Frontend.cpp:609-616)

        (y3, J3), (y4, J4), wd, e = _reproj_system(
            pose, un0, un1, depth, has_depth.astype(jnp.float32),
            cfg.huber_reproj, 1.0,
        )
        # staged outlier rejection vs 2× previous mean (Frontend.cpp:690-693)
        keep = (n_depth_prev < 300) | (it < rej_stage) | (e < 2.0 * mean_prev)
        wd = wd * keep.astype(jnp.float32)

        n_depth = jnp.sum(has_depth & keep)
        sum_e = jnp.sum(jnp.where(has_depth & keep, e, 0.0))

        # HIGHEST: the default bf16 MXU passes corrupt this 6×6 Hessian on
        # TPU — measured a finite-but-garbage step that walked the rotation
        # regime's visual trajectory to 1e11 m (CPU, which computes f32
        # exactly, was unaffected). Same rule as ops/gn.accumulate.
        hp = dict(precision=jax.lax.Precision.HIGHEST)
        H = (
            jnp.einsum("n,ni,nj->ij", we * we, Je, Je, **hp)
            + jnp.einsum("n,ni,nj->ij", wd * wd, J3, J3, **hp)
            + jnp.einsum("n,ni,nj->ij", wd * wd, J4, J4, **hp)
        )
        g = (
            jnp.einsum("n,ni->i", we * we * re, Je, **hp)
            + jnp.einsum("n,ni->i", wd * wd * y3, J3, **hp)
            + jnp.einsum("n,ni->i", wd * wd * y4, J4, **hp)
        )
        if reduce_fn is not None:
            H, g, n_depth, sum_e = reduce_fn(H, g, n_depth, sum_e)
        mean = sum_e / jnp.maximum(n_depth, 1)
        delta = gn.solve_damped(H, g, lm_lambda=1e-5)
        # decoupled update (Frontend.cpp:436-441): t += δt, q ← δq·q
        pose = se3.Pose(
            se3.quat_normalize(
                se3.quat_mul(se3.so3_exp(delta[3:]), pose.q)
            ),
            pose.t + delta[:3],
        )
        # reference break: rot-update ypr norm < 1e-5 AND 10·|dt| < 1e-5
        # (Frontend.cpp:443-447); gn_tol=0 forces the full schedule
        converged = (jnp.linalg.norm(delta[3:]) < cfg.gn_tol) & (
            10.0 * jnp.linalg.norm(delta[:3]) < cfg.gn_tol
        )
        return (pose, mean, n_depth, it + 1, converged)

    def cond(carry):
        _, _, _, it, converged = carry
        return (it < cfg.gn_iters) & ~converged

    init = (pose0, jnp.float32(1e5), jnp.int32(0), jnp.int32(0),
            jnp.array(False))
    pose, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return pose


def _replenish(
    table: FeatureTable,
    img: jax.Array,
    cam,
    pose_w: se3.Pose,
    cfg: VisualConfig,
) -> FeatureTable:
    """Fill inactive slots with fresh per-cell corners (batched analog of the
    deficient-subregion FAST replenish, featureTracking.cpp:300-385)."""
    from ..ops import camera as cam_ops

    N = table.uv.shape[0]
    score = image.shi_tomasi_score(img)
    cand_uv, cand_ok = image.grid_select_features(
        score, table.uv, table.active,
        grid_rows=cfg.grid_rows, grid_cols=cfg.grid_cols,
        per_cell=cfg.max_features_per_cell,
    )
    free = ~table.active
    n_free = jnp.sum(free)
    free_order = jnp.argsort(jnp.where(free, 0, 1), stable=True)
    cand_rank = jnp.cumsum(cand_ok) - 1
    write_ok = cand_ok & (cand_rank < n_free)
    slot = jnp.where(
        write_ok, free_order[jnp.clip(cand_rank, 0, N - 1)], N
    )

    un = cam_ops.normalized(cam, cand_uv)

    def scat(dst, val):
        padded = jnp.concatenate([dst, jnp.zeros_like(dst[:1])], axis=0)
        return padded.at[slot].set(val)[:N]

    return FeatureTable(
        uv=scat(table.uv, cand_uv),
        active=jnp.concatenate([table.active, jnp.zeros(1, bool)]).at[slot].set(
            write_ok
        )[:N],
        depth=scat(table.depth, jnp.full_like(cand_uv[:, 0], -1.0)),
        start_un=scat(table.start_un, un),
        start_q=scat(
            table.start_q, jnp.broadcast_to(pose_w.q, (cand_uv.shape[0], 4))
        ),
        start_t=scat(
            table.start_t, jnp.broadcast_to(pose_w.t, (cand_uv.shape[0], 3))
        ),
        age=scat(table.age, jnp.zeros_like(cand_uv[:, 0], jnp.int32)),
        flow=scat(table.flow, jnp.zeros_like(cand_uv)),
    )


def depth_gates(
    uv1: jax.Array,
    ok: jax.Array,
    prev_dc: DepthCloud,
    table: FeatureTable,
    pose_w: se3.Pose,
    cam,
):
    """Depth association + triangulation fusion + residual-set gating for
    one tracked frame (steps 2-3 of ``Frontend::trackfeature``,
    Frontend.cpp:237-381). Row-wise pure — the sharded visual step runs it
    per feature shard (parallel/sharded_visual.py); ``solve_and_update``
    runs it whole. Returns (active, un0, un1, depth, has_depth, epi_ok)."""
    from ..ops import camera as cam_ops

    active = table.active & ok
    un0 = cam_ops.normalized(cam, table.uv)
    un1 = cam_ops.normalized(cam, uv1)

    # 2. lidar depth association on the previous frame's cloud
    d_lidar, ok_lidar = associate_depth(un0, active, prev_dc)

    # 3. triangulation fallback vs first observation
    T_first = se3.Pose(table.start_q, table.start_t)
    T_prev_first = se3.se3_compose(
        se3.se3_inverse(se3.Pose(
            jnp.broadcast_to(pose_w.q, table.start_q.shape),
            jnp.broadcast_to(pose_w.t, table.start_t.shape),
        )),
        T_first,
    )
    d_tri, ok_tri = triangulate(un0, table.start_un, T_prev_first)
    prev_d = table.depth
    has_prev = prev_d > 0

    # merge (Frontend.cpp:359-381): lidar wins; else fused triangulation;
    # else propagate previous depth
    d_tri_fused = jnp.where(has_prev, 0.4 * prev_d + 0.6 * d_tri, d_tri)
    depth = jnp.where(
        ok_lidar, d_lidar,
        jnp.where(ok_tri, d_tri_fused, jnp.where(has_prev, prev_d, 0.0)),
    )
    v1_flag = ok_lidar
    v2_flag = ~ok_lidar & (ok_tri | has_prev)
    has_depth = (v1_flag | v2_flag) & active & (depth > 0)
    epi_ok = (~v1_flag) & active      # v ∈ {0, 2} rows feed the epipolar set
    return active, un0, un1, depth, has_depth, epi_ok


def apply_solution(
    uv1: jax.Array,
    table: FeatureTable,
    active: jax.Array,
    un0: jax.Array,
    depth: jax.Array,
    has_depth: jax.Array,
    rel: se3.Pose,
    pose_w: se3.Pose,
) -> tuple[FeatureTable, se3.Pose]:
    """Steps 5-6 of the frame update given a solved relative pose: world
    integration + depth propagation + feature-table roll. Split out so a
    pose solved ELSEWHERE (the psum-reduced sharded solve) can drive the
    identical replicated state update (parallel/distributed_camlidar.py)."""
    # 5. integrate Tw ← Tw ∘ T_prev_cur (Frontend.cpp:461-462)
    new_pose_w = se3.se3_compose(pose_w, se3.se3_inverse(rel))

    # 6. propagate depth into the current frame (Frontend.cpp:484-513)
    p0 = (
        jnp.concatenate([un0, jnp.ones_like(un0[:, :1])], axis=-1)
        * depth[:, None]
    )
    p1 = se3.quat_rotate(rel.q[None], p0) + rel.t
    new_depth = jnp.where(has_depth, p1[:, 2], -1.0)

    table = FeatureTable(
        uv=uv1,
        active=active,
        depth=new_depth,
        start_un=table.start_un,
        start_q=table.start_q,
        start_t=table.start_t,
        age=table.age + 1,
        # next frame's LK warm start; inactive rows reset to the cold start
        flow=jnp.where(active[:, None], uv1 - table.uv, 0.0),
    )
    return table, new_pose_w


@partial(jax.jit, static_argnames=("cfg",))
def solve_and_update(
    uv1: jax.Array,
    ok: jax.Array,
    prev_dc: DepthCloud,
    table: FeatureTable,
    pose_w: se3.Pose,
    warm_rel: se3.Pose,
    cam,
    cfg: VisualConfig,
) -> tuple[FeatureTable, se3.Pose, se3.Pose]:
    """Post-tracking frame update: depth association, triangulation, pose GN,
    state propagation. Split from tracking/replenishment so each piece is a
    small independently-compiled program (monolithic visual graphs take
    pathologically long on some XLA backends)."""
    active, un0, un1, depth, has_depth, epi_ok = depth_gates(
        uv1, ok, prev_dc, table, pose_w, cam
    )

    # 4. pose solve (T_cur_prev), warm-started
    rel = solve_pose(warm_rel, un0, un1, depth, has_depth, epi_ok, cfg)

    table, new_pose_w = apply_solution(
        uv1, table, active, un0, depth, has_depth, rel, pose_w
    )
    return table, rel, new_pose_w


def update_after_external_solve(
    uv1: jax.Array,
    ok: jax.Array,
    prev_dc: DepthCloud,
    table: FeatureTable,
    pose_w: se3.Pose,
    rel: se3.Pose,
    cam,
) -> tuple[FeatureTable, se3.Pose]:
    """Replicated state update for a relative pose solved by the SHARDED
    visual step: recomputes the (cheap, row-wise) gates and applies the
    identical table/pose propagation as ``solve_and_update``."""
    active, un0, _, depth, has_depth, _ = depth_gates(
        uv1, ok, prev_dc, table, pose_w, cam
    )
    return apply_solution(
        uv1, table, active, un0, depth, has_depth, rel, pose_w
    )


def visual_step(
    prev_pyr: tuple,
    cur_pyr: tuple,
    prev_dc: DepthCloud,
    table: FeatureTable,
    pose_w: se3.Pose,
    warm_rel: se3.Pose,
    cam,
    cfg: VisualConfig,
) -> tuple[FeatureTable, se3.Pose, se3.Pose]:
    """One frame of visual odometry as three jitted programs
    (track → solve/update → replenish). Returns (table, T_cur_prev, Tw)."""
    uv1, ok = lk.track_pyramid_reverse_checked(
        prev_pyr, cur_pyr, table.uv, table.active, table.flow,
        win=cfg.lk_window, iters=cfg.lk_iters, levels=cfg.lk_levels,
        max_reverse_err=cfg.reverse_check_px,
        reverse_levels=cfg.lk_reverse_levels or None,
        iters_coarse=cfg.lk_iters_coarse or None,
        eps=cfg.lk_eps,
        affine=cfg.lk_affine,
        reverse_affine=cfg.lk_reverse_affine,
    )
    table, rel, new_pose_w = solve_and_update(
        uv1, ok, prev_dc, table, pose_w, warm_rel, cam, cfg
    )
    table = _replenish_jit(table, cur_pyr[0], cam, new_pose_w, cfg)
    return table, rel, new_pose_w


_replenish_jit = jax.jit(_replenish, static_argnames=("cfg",))
_clahe_jit = jax.jit(image.clahe, static_argnames=("grid", "clip_limit", "n_bins"))


class VisualChunkState(NamedTuple):
    """Carried state of the fused K-frame visual program."""

    table: FeatureTable
    pose_w: se3.Pose
    warm_rel: se3.Pose
    prev_pyr: tuple          # previous frame's image pyramid
    prev_dc: DepthCloud


@partial(jax.jit, static_argnames=("cfg",))
def visual_chunk(
    state: VisualChunkState,
    imgs: jax.Array,         # (K, H, W) float32 in [0, 1]
    clouds: jax.Array,       # (K, M, 3) camera-frame lidar points
    cloud_masks: jax.Array,  # (K, M)
    cam,
    cfg: VisualConfig,
) -> tuple[VisualChunkState, se3.Pose]:
    """K frames of the FULL visual frontend in one device program.

    The per-frame path (CLAHE → pyramid → LK fwd/rev → depth assoc →
    pose GN → replenish) runs as three dispatches per frame in
    ``visual_step``; on the tunneled TPU each dispatch costs ~RPC latency
    and the stages can't fuse. Here a ``lax.scan`` carries (feature table,
    pose, warm start, previous pyramid + depth cloud) across K frames —
    one dispatch per chunk, mirroring ``lidar_odometry.odometry_chunk``.

    Returns (state, stacked world poses (K,)).
    """
    def step(carry: VisualChunkState, frame):
        img, pts, m = frame
        new_carry, rel, _ = chunk_frame_step(carry, img, pts, m, cam, cfg)
        return new_carry, (new_carry.pose_w.q, new_carry.pose_w.t)

    state, (qs, ts) = jax.lax.scan(
        step, state, (imgs, clouds, cloud_masks)
    )
    return state, se3.Pose(qs, ts)


def chunk_frame_step(
    carry: VisualChunkState, img: jax.Array, pts: jax.Array, m: jax.Array,
    cam, cfg: VisualConfig,
) -> tuple[VisualChunkState, se3.Pose]:
    """One visual frame inside a fused chunk program: dequantize → CLAHE →
    pyramid → LK fwd/rev → depth assoc + pose GN → replenish. Shared by
    ``visual_chunk`` and the coupled cam-lidar chunk
    (cam_lidar_pipeline.camlidar_coupled_chunk). Returns (carry,
    T_cur_prev, n_tracked) — the relative pose plus the PRE-replenish
    surviving-track count feed the lidar warm start + its health gate in
    the coupled mode (the reference's dormant tighter coupling,
    CamLidarProcess.cpp:278-307 ``#if 0``)."""
    if img.dtype == jnp.uint8:
        # images upload as uint8 (¼ the tunnel bytes; cameras are 8-bit
        # anyway) and dequantize on device
        img = img.astype(jnp.float32) * (1.0 / 255.0)
    if pts.dtype == jnp.uint16:
        # depth clouds upload like scans: uint16 @ 3.9 mm
        from .lidar_odometry import QUANT_OFFSET, QUANT_SCALE

        pts = pts.astype(jnp.float32) * QUANT_SCALE + QUANT_OFFSET
    if cfg.use_clahe:
        img = image.clahe(
            img, grid=cfg.clahe_grid, clip_limit=cfg.clahe_clip
        )
    pyr = tuple(image.build_pyramid(img, cfg.lk_levels))
    dc = build_depth_cloud(pts, m)
    uv1, ok = lk.track_pyramid_reverse_checked(
        carry.prev_pyr, pyr, carry.table.uv, carry.table.active,
        carry.table.flow,
        win=cfg.lk_window, iters=cfg.lk_iters, levels=cfg.lk_levels,
        max_reverse_err=cfg.reverse_check_px,
        reverse_levels=cfg.lk_reverse_levels or None,
        iters_coarse=cfg.lk_iters_coarse or None,
        eps=cfg.lk_eps,
        affine=cfg.lk_affine,
        reverse_affine=cfg.lk_reverse_affine,
    )
    table, rel, pose_w = solve_and_update(
        uv1, ok, carry.prev_dc, carry.table, carry.pose_w,
        carry.warm_rel, cam, cfg,
    )
    # tracking-health count BEFORE replenish (replenish refills the slots,
    # masking a tracking blackout) — the coupled warm-start gate uses it
    n_tracked = jnp.sum(table.active.astype(jnp.int32))
    table = _replenish(table, pyr[0], cam, pose_w, cfg)
    return VisualChunkState(table, pose_w, rel, pyr, dc), rel, n_tracked


def init_chunk_state(
    img0: jax.Array, pts0: jax.Array, mask0: jax.Array, cam,
    cfg: VisualConfig,
) -> VisualChunkState:
    """Bootstrap the chunk carry from frame 0 (replenish-only, no tracking)."""
    if cfg.use_clahe:
        img0 = _clahe_jit(
            img0, grid=cfg.clahe_grid, clip_limit=cfg.clahe_clip
        )
    pyr = tuple(image.build_pyramid(img0, cfg.lk_levels))
    dc = build_depth_cloud(pts0, mask0)
    table = _replenish_jit(
        empty_table(cfg.max_tracked), pyr[0], cam, se3.identity_pose(), cfg
    )
    return VisualChunkState(
        table, se3.identity_pose(), se3.identity_pose(), pyr, dc
    )


class VisualOdometry:
    """Host driver for the visual frontend (≡ CamLidarProcess thread C +
    Frontend state)."""

    def __init__(self, cam, cfg: VisualConfig = VisualConfig()):
        self.cam = cam
        self.cfg = cfg
        self.table = empty_table(cfg.max_tracked)
        self.pose_w = se3.identity_pose()
        self.warm_rel = se3.identity_pose()
        self.prev_pyr = None
        self.prev_dc = None

    def process(
        self, img: jax.Array, pts_cam: jax.Array, pts_mask: jax.Array
    ) -> se3.Pose:
        """img (H, W) [0,1]; pts_cam: lidar points in the camera frame."""
        if self.cfg.use_clahe:
            img = _clahe_jit(
                img, grid=self.cfg.clahe_grid, clip_limit=self.cfg.clahe_clip
            )
        pyr = tuple(image.build_pyramid(img, self.cfg.lk_levels))
        dc = build_depth_cloud(pts_cam, pts_mask)
        if self.prev_pyr is None:
            self.table = _replenish_jit(
                self.table, pyr[0], self.cam, self.pose_w, self.cfg
            )
        else:
            self.table, rel, self.pose_w = visual_step(
                self.prev_pyr, pyr, self.prev_dc, self.table,
                self.pose_w, self.warm_rel, self.cam, self.cfg,
            )
            self.warm_rel = rel
        self.prev_pyr = pyr
        self.prev_dc = dc
        return self.pose_w
