"""Direct (photometric) visual odometry pipeline (≡ Frontend::track_camlidar).

The reference's alternative VO path — constant-velocity prior, Tracker2
photometric alignment against the latest keyframe, keyframe creation by
visible-ratio, 5-keyframe window with (commented-out) photometric BA
(``src/vloam/Frontend.cpp:64-186``, SURVEY.md §3.6 "dormant"). Here the path
is fully wired, including the window refinement the reference left disabled:

* track: ``tracker_direct.track`` (coarse-to-fine, t-dist weights)
* keyframe policy: visible ratio below threshold (the reference hardcodes the
  decision to always-true, ``Frontend.cpp:165-167`` — configurable here)
* window BA: ``window_ba.refine`` over the keyframe window whenever a
  keyframe is added (≡ the `WindowOptimizer::refine()` call at
  ``Frontend.cpp:175-178``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models import keyframe as kfm
from ..models import tracker_direct, window_ba
from ..ops import camera as cam_ops
from ..ops import image, se3
from ..utils.config import VisualConfig


def _run_window_ba(pyrs, pts, masks, poses, cam, cfg: VisualConfig):
    """Shared BA invocation for the host loop and the fused chunk — one
    place for the cost knobs (ba_points stride, ba_level, ba_iters) so the
    two paths stay bit-identical (tests/test_direct_tracker.py parity)."""
    stride = max(1, pts.shape[1] // cfg.ba_points) if cfg.ba_points else 1
    prec = {
        "high": jax.lax.Precision.HIGH,
        "bf16": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[cfg.ba_sample_precision]
    return window_ba.refine(
        pyrs, pts[:, ::stride], masks[:, ::stride], poses, cam,
        n_iters=cfg.ba_iters,
        level=min(cfg.ba_level, cfg.pyramid_levels - 1),
        tdist_dof=cfg.tdist_dof,
        step_tol=cfg.ba_step_tol,
        sample_precision=prec,
        pair_radius=cfg.ba_pair_radius,
    )


class DirectVO:
    def __init__(
        self,
        cam,
        cfg: VisualConfig = VisualConfig(),
        *,
        keyframe_visible_ratio: float = 1.1,  # >1 ⇒ every frame (reference behavior)
        run_window_ba: bool = True,
        point_cap: int = 2048,
    ):
        self.cam = cam
        self.cfg = cfg
        self.kf_ratio = keyframe_visible_ratio
        self.run_window_ba = run_window_ba
        self.point_cap = point_cap
        self.window = kfm.KeyframeWindow(cfg.keyframe_window)
        self.pose_w = se3.identity_pose()       # Twc
        self.vel = se3.identity_pose()          # constant-velocity prior T_k_km1
        self.ref_kf: kfm.Keyframe | None = None

    def process(
        self, img: jax.Array, pts_cam: jax.Array, pts_mask: jax.Array
    ) -> se3.Pose:
        pyr = tuple(image.build_pyramid(img, self.cfg.pyramid_levels))
        if self.ref_kf is None:
            self.ref_kf = kfm.make_keyframe(
                img, self.cam, pts_cam, pts_mask, self.pose_w,
                levels=self.cfg.pyramid_levels, cap=self.point_cap,
            )
            self.window.add(self.ref_kf)
            return self.pose_w

        # constant-velocity warm start: T_cur_kf ≈ vel ∘ (T_kf_w ∘ T_w_last)
        T_last_kf = se3.se3_compose(
            se3.se3_inverse(self.pose_w), self.ref_kf.pose_w
        )
        init = se3.se3_compose(self.vel, se3.se3_inverse(T_last_kf))
        T_cur_kf = tracker_direct.track(
            self.ref_kf, pyr, self.cam, init,
            levels=self.cfg.pyramid_levels,
            tdist_dof=self.cfg.tdist_dof,
        )
        prev_pose = self.pose_w
        self.pose_w = se3.se3_compose(
            self.ref_kf.pose_w, se3.se3_inverse(T_cur_kf)
        )
        self.vel = se3.se3_compose(
            se3.se3_inverse(self.pose_w), prev_pose
        )

        # keyframe decision (visible-ratio criterion, Keyframe.cpp:97-131)
        cur_kf = kfm.make_keyframe(
            img, self.cam, pts_cam, pts_mask, self.pose_w,
            levels=self.cfg.pyramid_levels, cap=self.point_cap,
        )
        ratio = self.window.visible_ratio(cur_kf, self.ref_kf, self.cam)
        if ratio < self.kf_ratio:
            self.window.add(cur_kf)
            self.ref_kf = cur_kf
            if self.run_window_ba and len(self.window) == self.window.size:
                pyrs, pts, masks, poses = self.window.stacked()
                refined = _run_window_ba(
                    pyrs, pts, masks, poses, self.cam, self.cfg
                )
                for i, kf in enumerate(self.window.frames):
                    self.window.frames[i] = kf._replace(
                        pose_w=se3.Pose(refined.q[i], refined.t[i])
                    )
                self.ref_kf = self.window.frames[-1]
                self.pose_w = self.ref_kf.pose_w
        return self.pose_w


# ---------------------------------------------------------------------------
# Fused K-frame device program (the tunneled-TPU fast path)
# ---------------------------------------------------------------------------
#
# The host ``DirectVO.process`` loop costs one ~30 ms host↔device round trip
# per frame just for the keyframe decision (``float(visible_ratio)``). The
# chunk program keeps the whole window state — pyramids, selected points,
# poses — on device and runs K frames of {track → keyframe decision →
# window BA} as one ``lax.scan``; the decision is a ``lax.cond`` on a device
# scalar (≡ Frontend.cpp:162-167, with the BA call the reference left
# commented out at :175-178 live at every full-window keyframe).

class DirectChunkState(NamedTuple):
    pyrs: tuple               # per level: (S, H/2^l, W/2^l) window pyramids
    points: jax.Array         # (S, P, 3) selected keyframe points
    point_mask: jax.Array     # (S, P)
    poses_q: jax.Array        # (S, 4) window world poses (newest = slot S-1)
    poses_t: jax.Array        # (S, 3)
    count: jax.Array          # () int32 — filled slots
    pose_w: se3.Pose          # current-frame world pose
    vel: se3.Pose             # constant-velocity prior T_k_km1


def _ref_keyframe(state: DirectChunkState) -> kfm.Keyframe:
    S = state.points.shape[0]
    return kfm.Keyframe(
        tuple(p[S - 1] for p in state.pyrs),
        state.points[S - 1], state.point_mask[S - 1],
        se3.Pose(state.poses_q[S - 1], state.poses_t[S - 1]),
    )


def _visible_ratio(cam, kf: kfm.Keyframe, pose_new: se3.Pose) -> jax.Array:
    """Device-scalar fraction of the reference keyframe's points visible from
    the candidate pose (Keyframe.cpp:97-131) — no host sync."""
    T_ab = se3.se3_compose(se3.se3_inverse(pose_new), kf.pose_w)
    pts = se3.se3_apply(T_ab, kf.points)
    uv, front = cam_ops.project(cam, pts)
    vis = kf.point_mask & front & cam_ops.is_in_image(cam, uv)
    return jnp.sum(vis) / jnp.maximum(jnp.sum(kf.point_mask), 1)


def init_direct_state(
    img0: jax.Array, pts0_cam: jax.Array, mask0: jax.Array, cam,
    cfg: VisualConfig, *, point_cap: int = 2048,
) -> DirectChunkState:
    """Bootstrap the window with frame 0 as the first keyframe."""
    S = cfg.keyframe_window
    kf = kfm.make_keyframe(
        img0, cam, pts0_cam, mask0, se3.identity_pose(),
        levels=cfg.pyramid_levels, cap=point_cap,
    )
    pyrs = tuple(
        jnp.concatenate([jnp.zeros((S - 1, *l.shape), l.dtype), l[None]])
        for l in kf.pyramid
    )
    ident = se3.identity_pose()
    return DirectChunkState(
        pyrs=pyrs,
        points=jnp.concatenate(
            [jnp.zeros((S - 1, *kf.points.shape), kf.points.dtype),
             kf.points[None]]
        ),
        point_mask=jnp.concatenate(
            [jnp.zeros((S - 1, *kf.point_mask.shape), bool),
             kf.point_mask[None]]
        ),
        poses_q=jnp.concatenate(
            [jnp.tile(ident.q[None], (S - 1, 1)), ident.q[None]]
        ),
        poses_t=jnp.zeros((S, 3), jnp.float32),
        count=jnp.asarray(1, jnp.int32),
        pose_w=ident,
        vel=ident,
    )


def _direct_step(
    state: DirectChunkState, img: jax.Array, pts_cam: jax.Array,
    pmask: jax.Array, cam, cfg: VisualConfig,
    kf_ratio: float, run_ba: bool, point_cap: int,
) -> tuple[DirectChunkState, se3.Pose]:
    S = state.points.shape[0]
    pyr = tuple(image.build_pyramid(img, cfg.pyramid_levels))
    ref = _ref_keyframe(state)

    T_last_kf = se3.se3_compose(se3.se3_inverse(state.pose_w), ref.pose_w)
    init = se3.se3_compose(state.vel, se3.se3_inverse(T_last_kf))
    T_cur_kf = tracker_direct.track(
        ref, pyr, cam, init,
        levels=cfg.pyramid_levels, tdist_dof=cfg.tdist_dof,
    )
    pose_new = se3.se3_compose(ref.pose_w, se3.se3_inverse(T_cur_kf))
    vel = se3.se3_compose(se3.se3_inverse(pose_new), state.pose_w)

    sel_pts, sel_mask = kfm.select_points(
        img, cam, pts_cam, pmask, cap=point_cap
    )
    ratio = _visible_ratio(cam, ref, pose_new)

    base = state._replace(pose_w=pose_new, vel=vel)

    def add_kf(st: DirectChunkState) -> DirectChunkState:
        pyrs = tuple(
            jnp.concatenate([p[1:], l[None]])
            for p, l in zip(st.pyrs, pyr)
        )
        points = jnp.concatenate([st.points[1:], sel_pts[None]])
        pmask2 = jnp.concatenate([st.point_mask[1:], sel_mask[None]])
        q = jnp.concatenate([st.poses_q[1:], pose_new.q[None]])
        t = jnp.concatenate([st.poses_t[1:], pose_new.t[None]])
        count = jnp.minimum(st.count + 1, S)
        if run_ba:
            def do_ba(qt):
                refined = _run_window_ba(
                    pyrs, points, pmask2, se3.Pose(qt[0], qt[1]), cam, cfg
                )
                return refined.q, refined.t

            q, t = jax.lax.cond(count >= S, do_ba, lambda qt: qt, (q, t))
        return DirectChunkState(
            pyrs, points, pmask2, q, t, count,
            se3.Pose(q[S - 1], t[S - 1]), vel,
        )

    new_state = jax.lax.cond(
        ratio < kf_ratio, add_kf, lambda st: st, base
    )
    return new_state, new_state.pose_w


@partial(jax.jit, static_argnames=("cfg", "kf_ratio", "run_ba", "point_cap"))
def direct_chunk(
    state: DirectChunkState,
    imgs: jax.Array,       # (K, H, W) uint8
    pts: jax.Array,        # (K, P, 3) uint16 (lidar_odometry quantization)
    masks: jax.Array,      # (K, P)
    cam,
    cfg: VisualConfig,
    kf_ratio: float = 1.1,
    run_ba: bool = True,
    point_cap: int = 2048,
) -> tuple[DirectChunkState, se3.Pose]:
    """K frames of the direct-photometric stack in ONE device program."""
    from .lidar_odometry import QUANT_OFFSET, QUANT_SCALE

    def step(st, frame):
        img8, qp, m = frame
        img = img8.astype(jnp.float32) * (1.0 / 255.0)
        pts_cam = qp.astype(jnp.float32) * QUANT_SCALE + QUANT_OFFSET
        return _direct_step(
            st, img, pts_cam, m, cam, cfg, kf_ratio, run_ba, point_cap
        )

    return jax.lax.scan(step, state, (imgs, pts, masks))


@partial(jax.jit, static_argnames=("P", "img_shape"))
def _split_direct_upload(comb: jax.Array, P: int, img_shape: tuple):
    """Split the per-chunk single uint16 upload back into (qpts uint16,
    imgs uint8, masks bool) on device. The tunneled TPU pays a fixed
    per-transfer cost on top of the byte rate (BASELINE.md ≈55 ms +
    12.5 ms/MB); packing the direct chunk's three uploads into one buffer
    removes two fixed costs per chunk (same trick as the cam-lidar
    chunk's ``_split_packed_upload``)."""
    K = comb.shape[0]
    n_q = P * 3
    qpts = comb[:, :n_q].reshape(K, P, 3)
    rest8 = jax.lax.bitcast_convert_type(
        comb[:, n_q:], jnp.uint8
    ).reshape(K, -1)
    ms = rest8[:, :P] != 0
    n_img = int(np.prod(img_shape))
    imgs = rest8[:, P:P + n_img].reshape(K, *img_shape)
    return qpts, imgs, ms


def _pack_direct_upload(qpts: np.ndarray, imgs: np.ndarray,
                        ms: np.ndarray) -> np.ndarray:
    """(K,P,3) uint16 + (K,H,W) uint8 + (K,P) bool → one (K, n) uint16."""
    K, P, _ = qpts.shape
    tail8 = np.concatenate(
        [ms.astype(np.uint8).reshape(K, -1),
         np.ascontiguousarray(imgs).reshape(K, -1)], axis=1,
    )
    if tail8.shape[1] % 2:
        tail8 = np.pad(tail8, ((0, 0), (0, 1)))
    return np.concatenate(
        [qpts.reshape(K, -1), tail8.view(np.uint16)], axis=1
    )


class DirectVOChunked:
    """Host driver for the fused direct-VO path: per chunk one upload + one
    async dispatch, poses fetched in a single epilogue — no per-frame host
    syncs (VERDICT r2 weak #3)."""

    def __init__(self, cam, cfg: VisualConfig = VisualConfig(), *,
                 keyframe_visible_ratio: float = 1.1, run_window_ba: bool = True,
                 point_cap: int = 2048):
        self.cam = cam
        self.cfg = cfg
        self.kf_ratio = keyframe_visible_ratio
        self.run_ba = run_window_ba
        self.point_cap = point_cap
        # single-buffer chunk upload (see _split_direct_upload); False = the
        # three separate transfers, kept for the A/B in BASELINE.md
        self.pack_upload = True

    def run_chunked(self, images, clouds, cloud_masks, chunk: int = 8,
                    progress: bool = False,
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 0,
                    resume: bool = False, stop_after: int | None = None):
        """images: list of (H, W) float [0,1] or uint8; clouds: list of
        (P, 3) float32 camera-frame points; cloud_masks: list of (P,) bool.
        Returns (positions (N, 3), quaternions (N, 4), wall seconds).

        checkpoint_every/checkpoint_path snapshot the DirectChunkState +
        trajectory at chunk boundaries (utils/checkpoint.py); resume=True
        continues bit-exactly from the snapshot (VERDICT r4 next #2)."""
        import time

        from .lidar_odometry import QUANT_OFFSET, QUANT_SCALE

        n = len(images)
        P = clouds[0].shape[0]
        im0 = np.asarray(images[0], np.float32)
        if im0.dtype == np.uint8 or im0.max() > 1.5:
            im0 = im0 / 255.0
        prefix = None
        if resume:
            from ..utils import checkpoint as ckpt

            data = np.load(checkpoint_path)
            start = int(data["frame_idx"])
            prefix = (np.asarray(data["traj_q"]), np.asarray(data["traj_t"]))
            _, state = ckpt.load_chunk_states(checkpoint_path)
        else:
            state = init_direct_state(
                jnp.asarray(im0), jnp.asarray(clouds[0]),
                jnp.asarray(cloud_masks[0]), self.cam, self.cfg,
                point_cap=self.point_cap,
            )
            start = 1

        t0 = time.time()
        qs_chunks, ts_chunks = [], []
        host_q: list = []   # incremental host copies for checkpoint saves
        host_t: list = []   # (see OdometryPipeline.maybe_checkpoint)
        n_done = n
        last_saved = start
        for s in range(start, n, chunk):
            batch = list(range(s, min(s + chunk, n)))
            imgs = np.zeros((chunk, *im0.shape), np.uint8)
            qpts = np.zeros((chunk, P, 3), np.uint16)
            ms = np.zeros((chunk, P), bool)
            for i, k in enumerate(batch):
                im = np.asarray(images[k])
                imgs[i] = (
                    im if im.dtype == np.uint8
                    else np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
                )
                qpts[i] = (np.clip(
                    (np.asarray(clouds[k]) - QUANT_OFFSET) / QUANT_SCALE,
                    0.0, 65535.0) + 0.5).astype(np.uint16)
                ms[i] = np.asarray(cloud_masks[k])
            if self.pack_upload:
                comb = _pack_direct_upload(qpts, imgs, ms)
                dq, dimg, dm = _split_direct_upload(
                    jnp.asarray(comb), P, imgs.shape[1:]
                )
            else:
                dq, dimg, dm = (
                    jnp.asarray(qpts), jnp.asarray(imgs), jnp.asarray(ms)
                )
            state, poses = direct_chunk(
                state, dimg, dq, dm,
                self.cam, self.cfg, kf_ratio=self.kf_ratio,
                run_ba=self.run_ba, point_cap=self.point_cap,
            )
            qs_chunks.append(poses.q)
            ts_chunks.append(poses.t)
            next_s = min(s + chunk, n)
            stop = stop_after is not None and next_s > stop_after
            if checkpoint_path and checkpoint_every > 0 and (
                next_s - last_saved >= checkpoint_every or stop
            ):
                from ..utils import checkpoint as ckpt

                done = next_s - 1
                for c in qs_chunks[len(host_q):]:
                    host_q.append(np.asarray(c))
                for c in ts_chunks[len(host_t):]:
                    host_t.append(np.asarray(c))
                tq = np.concatenate(host_q)
                tt = np.concatenate(host_t)
                if prefix is not None:
                    tq = np.concatenate([prefix[0], tq])
                    tt = np.concatenate([prefix[1], tt])
                ckpt.save_checkpoint(
                    checkpoint_path, frame_idx=next_s,
                    trajectory_q=tq[:done], trajectory_t=tt[:done],
                    direct_chunk=state,
                )
                last_saved = next_s
            if stop:
                n_done = next_s
                break
        # ONE concatenating device program + one D2H per array: fetching each
        # chunk separately was 2 RPC round trips per chunk (~30 ms each over
        # the tunnel) serialized at the end of the run — ~0.3 s of the
        # 48-frame wall clock (same epilogue as cam_lidar_pipeline._cat)
        from .cam_lidar_pipeline import _cat

        n = n_done
        qs = (np.asarray(_cat(qs_chunks)) if qs_chunks
              else np.zeros((0, 4), np.float32))
        ts = (np.asarray(_cat(ts_chunks)) if ts_chunks
              else np.zeros((0, 3), np.float32))
        if prefix is not None:
            qs = np.concatenate([prefix[0], qs])
            ts = np.concatenate([prefix[1], ts])
        qs, ts = qs[:n - 1], ts[:n - 1]
        wall = time.time() - t0

        ident = np.array([[1.0, 0, 0, 0]], np.float32)
        qs = np.concatenate([ident, qs])
        ts = np.concatenate([np.zeros((1, 3), np.float32), ts])
        if progress:
            done = max(n - start, 1)
            print(f"direct-VO fused: {n} frames ({done} computed) in "
                  f"{wall:.2f}s → {done / wall:.1f} fps")
        return ts, qs, wall
