"""Combined camera-lidar odometry system (≡ CamLidarProcess + laserOdometry).

The reference's laserOdometry node embeds the whole visual stack: a
CamLidarProcess with three threads pairs images with clouds, transforms the
cloud into the camera frame by the extrinsic (``CamLidarProcess.cpp:250-266``),
builds a Frame, and runs ``Frontend::trackfeature``, while the same process
independently runs lidar scan-to-scan (SURVEY.md §3.3-3.4 — the two estimators
run side by side, unfused, in the shipped code).

This driver reproduces that topology without threads: per matched (scan,
image) pair it dispatches the lidar path (register + scan-to-scan [+ mapping])
and the visual path (frontend VO on the camera-frame cloud), both
asynchronous device programs, and reports both trajectories — the visual one
mapped back to the lidar frame via ``T_w_lidar = T_w_cam · T_cam_lidar``
(``CamLidarProcess.cpp:284-293``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..data.sync import match_nearest
from ..models import lidar_odometry as lo
from ..models import scan_registration as sr
from ..models import visual_frontend as vf
from ..ops import camera as cam_ops
from ..ops import pointcloud as pc
from ..ops import se3
from ..utils.config import SystemConfig


#: concat per-chunk device outputs into one array — single dispatch + single
#: D2H instead of one RPC per chunk (retraces only per distinct chunk count)
_cat = jax.jit(lambda xs: jnp.concatenate(xs))


@partial(jax.jit, static_argnames=("polar_shape", "img_shape"))
def _split_packed_upload(comb: jax.Array, polar_shape: tuple,
                         img_shape: tuple):
    """Split the per-chunk single-buffer upload back into (polar scans
    uint16, images uint8) on device.

    The tunneled TPU pays a fixed per-transfer cost on top of the byte
    rate (BASELINE.md: ≈55 ms + 12.5 ms/MB), so the cam-lidar chunk packs
    its two uploads (packed polar scans + uint8 images) into ONE uint16
    buffer per chunk; images travel as byte pairs and are bitcast back
    here (little-endian on both ends — byte-exactness is covered by
    tests/test_system.py::test_packed_upload_byte_roundtrip). Odd per-frame
    image byte counts are padded with one trailing byte on the host and
    sliced off here after the bitcast.
    """
    K = comb.shape[0]
    n_polar = int(np.prod(polar_shape))
    n_img = int(np.prod(img_shape))
    pimgs = comb[:, :n_polar].reshape(K, *polar_shape)
    img8 = jax.lax.bitcast_convert_type(
        comb[:, n_polar:], jnp.uint8
    ).reshape(K, -1)[:, :n_img].reshape(K, *img_shape)
    return pimgs, img8


def _pack_images_uint16(imgs: np.ndarray) -> np.ndarray:
    """(K, H, W) uint8 → (K, ceil(H·W/2)) uint16 byte pairs, host side.

    Only the per-frame TOTAL byte count needs to be even for the view —
    odd-width images (e.g. KITTI grayscale 1241 px) pad one trailing byte,
    which ``_split_packed_upload`` slices off after the device bitcast.
    """
    K = imgs.shape[0]
    flat = np.ascontiguousarray(imgs).reshape(K, -1)
    if flat.shape[1] % 2:
        flat = np.pad(flat, ((0, 0), (0, 1)))
    return flat.view(np.uint16)


def camera_cloud_select(raw: np.ndarray, R_cl: np.ndarray,
                        t_cl: np.ndarray, cap: int):
    """Host-side camera-frame depth-cloud selection shared by the
    single-device pipeline and the distributed composition: extrinsic
    transform, z>0.3 near-clip, even stride down to ``cap`` (scan order is
    azimuth-major — a plain [:cap] truncation would keep one azimuth wedge
    and leave most of the image without depth), fixed-capacity pad."""
    cam_pts = raw @ R_cl.T + t_cl
    cam_pts = cam_pts[cam_pts[:, 2] > 0.3]
    if cam_pts.shape[0] > cap:
        stride = -(-cam_pts.shape[0] // cap)
        cam_pts = cam_pts[::stride][:cap]
    return pc.pad_points(cam_pts, cap)


def _np_quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) from a 3×3 rotation, host numpy (Shepperd's method —
    same branch structure as ``se3.matrix_to_quat``, kept on host so
    pipeline construction never round-trips the tunnel)."""
    t = np.trace(R)
    if t > 0.0:
        s = np.sqrt(t + 1.0) * 2.0
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                      (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                      0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    q = q.astype(np.float32)
    return q / np.linalg.norm(q)


@jax.jit
def _map_cam_poses_to_lidar(cam_q, cam_t, T_lidar_cam, T_cam_lidar):
    """T_w_lidar = T_lidar_cam ∘ T_w_cam ∘ T_cam_lidar, batched over (N,).

    One device program for the whole trajectory — se3 ops broadcast, and a
    host loop of per-frame composes would pay an RPC round trip per op on
    the tunneled TPU (CamLidarProcess.cpp:284-293 does this per callback;
    here it is a batch epilogue).
    """
    p = se3.se3_compose(
        se3.se3_compose(T_lidar_cam, se3.Pose(cam_q, cam_t)), T_cam_lidar
    )
    return p.q, p.t


@partial(jax.jit, static_argnames=("lidar_cfg", "cap", "z_min"))
def cam_clouds_from_polar(
    pimgs: jax.Array,        # (K, R, W, C) uint16 packed polar scans
    R_cl: jax.Array,         # (3, 3) camera←lidar rotation
    t_cl: jax.Array,         # (3,)
    lidar_cfg,
    cap: int,
    z_min: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Camera-frame depth clouds derived ON DEVICE from the already-uploaded
    polar scans — replaces the separate host ``_cam_cloud`` upload
    (cap×3 uint16 + mask ≈ 114 KB/frame over the tunnel; the pipeline is
    transfer-bytes-bound).

    Selection parity with the host path: keep points in front of the camera
    (z > z_min), then an even stride down to ``cap``. The stride is computed
    on device from the valid count; compaction is one data-carrying sort
    keyed by the strided rank (argsort+gather is the known-slow pattern —
    CLAUDE.md layout rules). Returns ((K, cap, 3) f32, (K, cap) bool).
    ≡ CamLidarProcess.cpp:250-266 (pcl::transformPointCloud by the
    extrinsic) fused with the depth-cloud build of Frame.cpp.
    """

    def one(img):
        cs = pc.polar_to_compact(
            img, n_scans=lidar_cfg.n_scans, width=lidar_cfg.azimuth_bins,
            min_range=lidar_cfg.min_range, max_range=lidar_cfg.max_range,
        )
        pts = cs.xyz.reshape(-1, 3)
        valid = cs.valid.reshape(-1)
        # geometry matmul: HIGHEST, not the bf16 default (meters at range)
        cam_pts = (
            jnp.matmul(pts, R_cl.T, precision=jax.lax.Precision.HIGHEST)
            + t_cl
        )
        valid = valid & (cam_pts[:, 2] > z_min)
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        cnt = jnp.maximum(rank[-1] + 1, 1)
        stride = (cnt + cap - 1) // cap
        sel = valid & (rank % stride == 0)
        n_sel = (cnt + stride - 1) // stride
        big = jnp.int32(pts.shape[0] + 1)
        key = jnp.where(sel, rank // stride, big)
        _, xs, ys, zs = jax.lax.sort(
            (key, cam_pts[:, 0], cam_pts[:, 1], cam_pts[:, 2]),
            num_keys=1, is_stable=True, dimension=0,
        )
        out = jnp.stack([xs[:cap], ys[:cap], zs[:cap]], axis=-1)
        mask = jnp.arange(cap, dtype=jnp.int32) < n_sel
        return out, mask

    return jax.vmap(one)(pimgs)


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg", "vis_cfg",
                                   "max_prior_step"))
def camlidar_coupled_chunk(
    odo_state,
    vis_state,
    pimgs: jax.Array,       # (K, R, W, 2) uint16 packed polar scans
    imgs: jax.Array,        # (K, H, W) uint8
    clouds: jax.Array,      # (K, M, 3) uint16 camera-frame depth clouds
    cmasks: jax.Array,      # (K, M)
    T_lidar_cam: se3.Pose,
    T_cam_lidar: se3.Pose,
    cam,
    lidar_cfg,
    odom_cfg,
    vis_cfg,
    max_prior_step: float = 2.0,
):
    """K frames of TIGHTLY-COUPLED camera+lidar odometry in one device
    program: per frame the visual frontend runs first and its relative pose
    (mapped to the lidar frame through the extrinsic chain) warm-starts the
    scan-to-scan Gauss-Newton instead of the constant-velocity prior.

    This is the coupling the reference sketches but ships disabled
    (``CamLidarProcess.cpp:278-307``, ``Frontend.cpp:90-127`` ``#if 0``): the
    visual estimate finally gets a consumer. A plausibility gate (prior
    translation < ``max_prior_step``) falls back to constant velocity when
    visual tracking degenerates — the degraded-mode behavior those blocks
    hint at. Returns (odo_state, vis_state, lidar poses, visual poses).
    """
    from .scan_registration import register_polar_impl

    def step(carry, frame):
        odo, vis = carry
        pimg, img, pts, m = frame
        vis2, rel_cam, n_trk = vf.chunk_frame_step(
            vis, img, pts, m, cam, vis_cfg
        )
        # T_prevlidar_curlidar = T_lidar_cam ∘ T_prevcam_curcam ∘ T_cam_lidar;
        # solve_and_update returns rel = T_cur_prev, so invert. The
        # plausibility + tracking-health gate (translation/rotation bounds,
        # finiteness, surviving-track count) is the degraded-mode fallback
        # of Frontend.cpp:90-127.
        init = _visual_prior_gate(
            odo, rel_cam, T_lidar_cam, T_cam_lidar, max_prior_step,
            n_tracked=n_trk,
            min_tracked=int(vis_cfg.coupled_min_track_ratio
                            * vis_cfg.max_tracked),
        )
        feats = register_polar_impl(pimg, lidar_cfg).features
        odo2, pose_w = lo.odometry_step(odo, feats, odom_cfg, init_rel=init)
        return (odo2, vis2), (
            pose_w.q, pose_w.t, vis2.pose_w.q, vis2.pose_w.t,
        )

    (odo_state, vis_state), (lq, lt, vq, vt) = jax.lax.scan(
        step, (odo_state, vis_state), (pimgs, imgs, clouds, cmasks)
    )
    return odo_state, vis_state, se3.Pose(lq, lt), se3.Pose(vq, vt)


def visual_prior_gate(fallback_rel: se3.Pose, rel_cam, T_lidar_cam,
                      T_cam_lidar, max_prior_step: float,
                      n_tracked=None, min_tracked: int = 0):
    """Map the visual relative pose into the lidar frame and gate it for
    plausibility (shared by the coupled chunks AND the distributed
    composition, parallel/distributed_camlidar.py; see
    camlidar_coupled_chunk). ``fallback_rel`` is the constant-velocity
    prior the gate falls back to (the previous frame's relative pose).

    ``n_tracked``/``min_tracked`` add the tracking-HEALTH term: magnitude
    plausibility alone passes a confidently-wrong prior when the camera
    blacks out (U-turns sweep the whole view out of frame in a few frames
    — the visual pose stays plausible-sized while tracking nothing, and
    feeding it measured lidar ATE 0.17 → 4.33 m on the revisit regime at
    the bench camera). Gating on the pre-replenish surviving-track count
    falls back to constant velocity exactly there."""
    prior = se3.se3_compose(
        T_lidar_cam,
        se3.se3_compose(se3.se3_inverse(rel_cam), T_cam_lidar),
    )
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(prior.q[0]), 0.0, 1.0))
    ok = (
        (jnp.linalg.norm(prior.t) < max_prior_step)
        & (ang < 0.6)
        & jnp.all(jnp.isfinite(prior.t))
        & jnp.all(jnp.isfinite(prior.q))
    )
    if n_tracked is not None and min_tracked > 0:
        ok = ok & (n_tracked >= min_tracked)
    return se3.Pose(
        jnp.where(ok, prior.q, fallback_rel.q),
        jnp.where(ok, prior.t, fallback_rel.t),
    )


def _visual_prior_gate(odo, rel_cam, T_lidar_cam, T_cam_lidar,
                       max_prior_step: float,
                       n_tracked=None, min_tracked: int = 0):
    return visual_prior_gate(
        odo.pose_rel, rel_cam, T_lidar_cam, T_cam_lidar, max_prior_step,
        n_tracked=n_tracked, min_tracked=min_tracked,
    )


@partial(jax.jit, static_argnames=("lidar_cfg", "odom_cfg", "map_cfg",
                                   "vis_cfg", "coupled", "map_skip",
                                   "max_prior_step"))
def camlidar_slam_chunk(
    odo_state,
    map_state,
    vis_state,
    pimgs: jax.Array,       # (K, R, W, C) uint16 packed polar scans
    imgs: jax.Array,        # (K, H, W) uint8
    clouds: jax.Array,      # (K, M, 3) camera-frame depth clouds
    cmasks: jax.Array,      # (K, M)
    T_lidar_cam: se3.Pose,
    T_cam_lidar: se3.Pose,
    cam,
    lidar_cfg,
    odom_cfg,
    map_cfg,
    vis_cfg,
    start_idx: jax.Array | int = 0,
    map_skip: int = 1,
    coupled: bool = False,
    max_prior_step: float = 2.0,
):
    """K frames of the reference's FULL topology in ONE device program:
    visual frontend + scan-to-scan odometry + scan-to-map refinement
    (laserOdometry embeds the visual stack while laserMapping runs behind
    it — ``laserOdometry.cpp:248,308`` + ``laserMapping.cpp:934``).

    coupled=True feeds the visual relative pose (extrinsic-mapped, gated)
    into the odometry warm start — the dormant coupling
    (``CamLidarProcess.cpp:278-307``) live inside the full stack.

    Returns (odo_state, map_state, vis_state, odom poses, mapped poses,
    visual camera-world poses), each a (K,)-stacked Pose.
    """
    from .device_mapping import device_mapping_impl
    from .scan_registration import register_polar_impl

    def step(carry, frame):
        odo, mp, vis = carry
        pimg, img, pts, m, i = frame
        vis2, rel_cam, n_trk = vf.chunk_frame_step(
            vis, img, pts, m, cam, vis_cfg
        )
        feats = register_polar_impl(pimg, lidar_cfg).features
        if coupled:
            init = _visual_prior_gate(
                odo, rel_cam, T_lidar_cam, T_cam_lidar, max_prior_step,
                n_tracked=n_trk,
                min_tracked=int(vis_cfg.coupled_min_track_ratio
                                * vis_cfg.max_tracked),
            )
            odo2, pose_w = lo.odometry_step(
                odo, feats, odom_cfg, init_rel=init
            )
        else:
            odo2, pose_w = lo.odometry_step(odo, feats, odom_cfg)
        if map_skip <= 1:
            mp, refined = device_mapping_impl(
                mp, feats.less_sharp.xyz, feats.less_sharp.mask,
                feats.less_flat.xyz, feats.less_flat.mask, pose_w, map_cfg,
            )
        else:
            mp, refined = jax.lax.cond(
                i % map_skip == 0,
                lambda mp, pose_w: device_mapping_impl(
                    mp, feats.less_sharp.xyz, feats.less_sharp.mask,
                    feats.less_flat.xyz, feats.less_flat.mask,
                    pose_w, map_cfg,
                ),
                lambda mp, pose_w: (
                    mp, se3.se3_compose(mp.correction, pose_w)
                ),
                mp, pose_w,
            )
        return (odo2, mp, vis2), (
            pose_w.q, pose_w.t, refined.q, refined.t,
            vis2.pose_w.q, vis2.pose_w.t,
        )

    K = pimgs.shape[0]
    frame_ids = (
        jnp.asarray(start_idx, jnp.int32) + jnp.arange(K, dtype=jnp.int32)
    )
    (odo_state, map_state, vis_state), out = jax.lax.scan(
        step, (odo_state, map_state, vis_state),
        (pimgs, imgs, clouds, cmasks, frame_ids),
    )
    oq, ot, mq, mt, vq, vt = out
    return (
        odo_state, map_state, vis_state,
        se3.Pose(oq, ot), se3.Pose(mq, mt), se3.Pose(vq, vt),
    )


@dataclass
class CamLidarResult:
    lidar_positions: np.ndarray     # (N, 3) lidar-odometry trajectory
    visual_positions: np.ndarray    # (N, 3) visual odometry in lidar frame
    lidar_quats: np.ndarray
    visual_quats: np.ndarray
    mapped_positions: np.ndarray | None = None  # (N, 3) scan-to-map refined
    mapped_quats: np.ndarray | None = None


class CamLidarPipeline:
    def __init__(self, cfg: SystemConfig = SystemConfig(), capacity: int = 131072):
        self.cfg = cfg
        self.capacity = capacity
        # single-buffer scan+image upload (default); False falls back to two
        # separate transfers per chunk — the ablation path of the packed
        # upload experiment in BASELINE.md
        self.pack_upload = True
        self.odom = lo.LidarOdometry(cfg.odometry)
        self.cam = cam_ops.Pinhole.from_config(cfg.camera)
        self.vo = vf.VisualOdometry(self.cam, cfg.visual)
        # T_cam_lidar extrinsic (Config camlidar 3×4 ≡ KITTI Tr), built in
        # numpy: each un-jitted device op here is a ~30 ms RPC round trip
        # on the tunneled TPU, and __init__ runs once per timed bench repeat
        E = np.asarray(cfg.extrinsic.matrix, np.float32)
        self.R_cl = E[:, :3]
        self.t_cl = E[:, 3]
        q_cl = _np_quat_from_matrix(self.R_cl)
        self.T_cam_lidar = se3.Pose(
            jnp.asarray(q_cl), jnp.asarray(self.t_cl)
        )
        # inverse: q⁻¹ = conj(q), t⁻¹ = −Rᵀ t
        q_inv = q_cl * np.array([1.0, -1.0, -1.0, -1.0], np.float32)
        self.T_lidar_cam = se3.Pose(
            jnp.asarray(q_inv),
            jnp.asarray(-(self.R_cl.T @ self.t_cl).astype(np.float32)),
        )

    def _cloud_to_camera(self, pts: np.ndarray) -> np.ndarray:
        return pts @ self.R_cl.T + self.t_cl

    def run(
        self,
        scans: list,
        images: list,
        scan_stamps: np.ndarray | None = None,
        image_stamps: np.ndarray | None = None,
    ) -> CamLidarResult:
        n = len(scans)
        if scan_stamps is None:
            scan_stamps = np.arange(n, dtype=np.float64) * 0.1
        if image_stamps is None:
            image_stamps = np.arange(len(images), dtype=np.float64) * 0.1
        pairing = match_nearest(scan_stamps, image_stamps)

        lidar_poses = []
        visual_poses = []
        pose_c = se3.identity_pose()
        cam_capacity = self.cfg.visual.depth_cloud_cap
        for k in range(n):
            raw = np.asarray(scans[k])[:, :3]
            xyz, mask = pc.pad_points(raw, self.capacity)

            # lidar path
            reg = sr.register_scan(
                jnp.asarray(xyz), jnp.asarray(mask), self.cfg.lidar
            )
            pose_l, _ = self.odom.process(reg.features)
            lidar_poses.append(pose_l)

            # visual path (only when an image is matched, CamLidarProcess
            # drops unmatched clouds)
            img_idx = pairing[k]
            if img_idx >= 0:
                cxyz, cmask = self._cam_cloud(raw)
                pose_c = self.vo.process(
                    jnp.asarray(np.asarray(images[img_idx], np.float32)),
                    jnp.asarray(cxyz),
                    jnp.asarray(cmask),
                )
            visual_poses.append(pose_c)

        # T_w_lidar = T_w_cam ∘ T_cam_lidar, batched (see run_chunked)
        vq, vt = _map_cam_poses_to_lidar(
            jnp.stack([p.q for p in visual_poses]),
            jnp.stack([p.t for p in visual_poses]),
            self.T_lidar_cam, self.T_cam_lidar,
        )
        return CamLidarResult(
            lidar_positions=np.stack([np.asarray(p.t) for p in lidar_poses]),
            visual_positions=np.asarray(vt),
            lidar_quats=np.stack([np.asarray(p.q) for p in lidar_poses]),
            visual_quats=np.asarray(vq),
        )

    def _cam_cloud(self, raw: np.ndarray):
        return camera_cloud_select(
            raw, self.R_cl, self.t_cl, self.cfg.visual.depth_cloud_cap
        )

    def run_chunked(self, scans: list, images: list, chunk: int = 8,
                    progress: bool = False,
                    ingest: str = "uint16",
                    coupled: bool = False,
                    mapping: bool = False,
                    map_skip: int = 1,
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 0,
                    resume: bool = False,
                    stop_after: int | None = None) -> CamLidarResult:
        """The fused fast path: per chunk ONE lidar device program
        (odometry_chunk_quantized / _polar) + ONE visual device program
        (visual_frontend.visual_chunk), both dispatched asynchronously —
        2 dispatches per K frames instead of ~5 per frame. Assumes
        1:1 scan/image pairing (the dataset-eval/bench mode). ingest =
        "uint16" | "polar" (see OdometryPipeline.run_chunked).

        coupled=True runs the TIGHTLY-COUPLED single program instead
        (camlidar_coupled_chunk): the visual relative pose warm-starts the
        lidar scan-to-scan solve — the reference's dormant coupling
        (CamLidarProcess.cpp:278-307) made live. Requires ingest="polar".

        mapping=True adds the scan-to-map stage to the fused program
        (camlidar_slam_chunk) — the reference's actual full topology
        (laserOdometry embeds the visual stack, laserMapping refines
        behind it); composes with coupled. Requires ingest="polar";
        mapped trajectory lands in CamLidarResult.mapped_positions."""
        import time

        import jax

        n = len(scans)
        assert len(images) == n
        if coupled or mapping:
            assert ingest.startswith("polar"), \
                "coupled/mapping modes use a polar ingest"
        if mapping:
            from ..models import device_mapping as dm

            map_state = dm.init_state(self.cfg.mapping)

        # Checkpoint/resume at chunk boundaries (VERDICT r4 next #2): all
        # carried device states (odometry features, VisualChunkState, map
        # pytree) plus the raw accumulated trajectories snapshot to one npz;
        # a resumed run replays the identical device programs on identical
        # state — bit-exact continuation (tests/test_run_kitti.py).
        prefix = None
        if resume:
            from ..utils import checkpoint as ckpt

            start, odo_state, _, _ = ckpt.load_checkpoint(checkpoint_path)
            vis_state, _ = ckpt.load_chunk_states(checkpoint_path)
            data = np.load(checkpoint_path)
            if odo_state is None or vis_state is None or (
                "traj_v_q" not in data
            ):
                raise ValueError(
                    f"{checkpoint_path} is not a cam-lidar pipeline "
                    "checkpoint (missing odometry/visual chunk state) — "
                    "was it written by a different mode?"
                )
            # the lidar trajectory lives under the cross-pipeline
            # "traj_q"/"traj_t" keys (single copy; the visual/map companions
            # ride in extra)
            prefix = {
                "traj_l_q": np.asarray(data["traj_q"]),
                "traj_l_t": np.asarray(data["traj_t"]),
                "traj_v_q": np.asarray(data["traj_v_q"]),
                "traj_v_t": np.asarray(data["traj_v_t"]),
            }
            if mapping:
                if "mapst_0" not in data:
                    raise ValueError(
                        f"{checkpoint_path} carries no map state — it was "
                        "written without mapping=True and cannot resume a "
                        "mapping run"
                    )
                map_state = ckpt.load_map_state(
                    checkpoint_path, map_state
                )
                prefix["traj_m_q"] = np.asarray(data["traj_m_q"])
                prefix["traj_m_t"] = np.asarray(data["traj_m_t"])
        else:
            # frame 0 bootstraps both carried states
            raw0 = np.asarray(scans[0])[:, :3]
            xyz0, mask0 = pc.pad_points(raw0, self.capacity)
            reg0 = sr.register_scan(
                jnp.asarray(xyz0), jnp.asarray(mask0), self.cfg.lidar
            )
            odo_state = lo.init_state(reg0.features)
            cxyz0, cmask0 = self._cam_cloud(raw0)
            vis_state = vf.init_chunk_state(
                jnp.asarray(np.asarray(images[0], np.float32)),
                jnp.asarray(cxyz0), jnp.asarray(cmask0),
                self.cam, self.cfg.visual,
            )
            start = 1

        t0 = time.time()
        # per chunk: pack (host) → upload → async dispatch of BOTH device
        # programs, so packing chunk k+1 overlaps chunk k's compute; only the
        # transfers serialize with compute on the tunneled TPU
        cam_capacity = self.cfg.visual.depth_cloud_cap
        lcfg = self.cfg.lidar
        lq, lt, vq, vt = [], [], [], []
        mapq, mapt = [], []
        host_acc: dict = {}   # per-list host copies of fetched chunks —
                              # checkpoint saves pull only NEW chunks (the
                              # full-traj _cat per save was O(N²) D2H + a
                              # remote re-compile per distinct arity)
        n_done = n
        last_saved = start
        for s in range(start, n, chunk):
            batch = list(range(s, min(s + chunk, n)))
            polar = ingest.startswith("polar")
            # uint8 image upload (¼ bytes over the tunnel; dequantized on
            # device in visual_chunk — cameras are 8-bit sources anyway).
            # Polar ingests derive the camera depth cloud ON DEVICE from the
            # scan upload (cam_clouds_from_polar) — the separate uint16
            # cloud upload was 114 KB/frame of the transfer-bound budget
            imgs = np.zeros((chunk, *np.asarray(images[0]).shape), np.uint8)
            if not polar:
                cxyz = np.zeros((chunk, cam_capacity, 3), np.uint16)
                cmask = np.zeros((chunk, cam_capacity), bool)
                qs = np.zeros((chunk, self.capacity, 3), np.uint16)
                counts = np.zeros((chunk,), np.int32)
            for i, k in enumerate(batch):
                raw = np.asarray(scans[k])[:, :3]
                if not polar:
                    qs[i], counts[i] = lo.quantize_scan(raw, self.capacity)
                im = np.asarray(images[k])
                imgs[i] = (
                    im if im.dtype == np.uint8
                    else np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
                )
                if not polar:
                    cf, cmask[i] = self._cam_cloud(raw)
                    cxyz[i] = (np.clip(
                        (cf - lo.QUANT_OFFSET) / lo.QUANT_SCALE, 0.0, 65535.0
                    ) + 0.5).astype(np.uint16)
            if polar:
                from ..data.native_pack import pack_polar_chunk

                packed = pack_polar_chunk(
                    [np.asarray(scans[k])[:, :3] for k in batch],
                    n_scans=lcfg.n_scans, width=lcfg.azimuth_bins,
                    min_range=lcfg.min_range, max_range=lcfg.max_range,
                    n_frames=chunk,
                    channels=1 if ingest == "polar2" else 2,
                )
                if self.pack_upload:
                    # ONE upload per chunk: scans + images share a uint16
                    # buffer (fixed per-transfer cost dominates at these
                    # sizes; see _split_packed_upload)
                    comb = np.concatenate(
                        [packed.reshape(chunk, -1), _pack_images_uint16(imgs)],
                        axis=1,
                    )
                    pimgs, dimgs = _split_packed_upload(
                        jnp.asarray(comb), packed.shape[1:], imgs.shape[1:]
                    )
                else:
                    pimgs = jnp.asarray(packed)
                    dimgs = jnp.asarray(imgs)
                dcx, dcm = cam_clouds_from_polar(
                    pimgs, jnp.asarray(self.R_cl), jnp.asarray(self.t_cl),
                    lcfg, cam_capacity,
                )
                if mapping:
                    (odo_state, map_state, vis_state, poses_l, poses_m,
                     poses_c) = camlidar_slam_chunk(
                        odo_state, map_state, vis_state, jnp.asarray(pimgs),
                        dimgs, dcx, dcm,
                        self.T_lidar_cam, self.T_cam_lidar, self.cam,
                        lcfg, self.cfg.odometry, self.cfg.mapping,
                        self.cfg.visual,
                        start_idx=s, map_skip=map_skip, coupled=coupled,
                    )
                    mapq.append(poses_m.q)
                    mapt.append(poses_m.t)
                elif coupled:
                    odo_state, vis_state, poses_l, poses_c = (
                        camlidar_coupled_chunk(
                            odo_state, vis_state, jnp.asarray(pimgs),
                            dimgs, dcx, dcm,
                            self.T_lidar_cam, self.T_cam_lidar, self.cam,
                            lcfg, self.cfg.odometry, self.cfg.visual,
                        )
                    )
                else:
                    odo_state, poses_l = lo.odometry_chunk_polar(
                        odo_state, jnp.asarray(pimgs), lcfg, self.cfg.odometry
                    )
            else:
                dimgs = jnp.asarray(imgs)
                dcx, dcm = jnp.asarray(cxyz), jnp.asarray(cmask)
                odo_state, poses_l = lo.odometry_chunk_quantized(
                    odo_state, jnp.asarray(qs), jnp.asarray(counts),
                    lcfg, self.cfg.odometry
                )
            if not coupled and not mapping:
                vis_state, poses_c = vf.visual_chunk(
                    vis_state, dimgs, dcx, dcm, self.cam, self.cfg.visual
                )
            lq.append(poses_l.q)
            lt.append(poses_l.t)
            vq.append(poses_c.q)
            vt.append(poses_c.t)
            next_s = min(s + chunk, n)
            stop = stop_after is not None and next_s > stop_after
            if checkpoint_path and checkpoint_every > 0 and (
                next_s - last_saved >= checkpoint_every or stop
            ):
                from ..utils import checkpoint as ckpt

                done = next_s - 1  # valid rows in the raw accumulations

                def fetch(xs, pk):
                    hl = host_acc.setdefault(pk, [])
                    for c in xs[len(hl):]:
                        hl.append(np.asarray(c))
                    got = np.concatenate(hl)
                    if prefix is not None:
                        got = np.concatenate([prefix[pk], got])
                    return got[:done]

                traj_l_q = fetch(lq, "traj_l_q")
                traj_l_t = fetch(lt, "traj_l_t")
                extra = {
                    "traj_v_q": fetch(vq, "traj_v_q"),
                    "traj_v_t": fetch(vt, "traj_v_t"),
                }
                if mapping:
                    extra["traj_m_q"] = fetch(mapq, "traj_m_q")
                    extra["traj_m_t"] = fetch(mapt, "traj_m_t")
                ckpt.save_checkpoint(
                    checkpoint_path, frame_idx=next_s, odom_state=odo_state,
                    trajectory_q=traj_l_q, trajectory_t=traj_l_t,
                    visual_chunk=vis_state,
                    map_state=map_state if mapping else None,
                    extra=extra,
                )
                last_saved = next_s
            if stop:
                n_done = next_s
                break
        # fetch all trajectories in 4 D2H transfers (not 4 per chunk: each
        # np.asarray is an RPC round trip on the tunnel) and map camera-world
        # poses to the lidar frame in ONE batched jitted call — a per-frame
        # host loop of tiny un-jitted composes was the hidden 60% of this
        # method's wall time (CamLidarProcess.cpp:284-293 does it per
        # callback; here it is a batch epilogue)
        def gather(xs, pk, width):
            """Raw accumulation rows (frames 1..n_done), prefix-aware."""
            got = (np.asarray(_cat(xs)) if xs
                   else np.zeros((0, width), np.float32))
            if prefix is not None:
                got = np.concatenate([prefix[pk], got])
            return got

        if prefix is None:  # stay on device — no extra RPC round trips
            dev_vq, dev_vt = _cat(vq), _cat(vt)
        else:
            dev_vq = jnp.asarray(gather(vq, "traj_v_q", 4))
            dev_vt = jnp.asarray(gather(vt, "traj_v_t", 3))
        mq, mt = _map_cam_poses_to_lidar(
            dev_vq, dev_vt, self.T_lidar_cam, self.T_cam_lidar,
        )
        n = n_done
        lidar_q_d = gather(lq, "traj_l_q", 4)
        lidar_t_d = gather(lt, "traj_l_t", 3)
        vis_q, vis_t = np.asarray(mq)[:n - 1], np.asarray(mt)[:n - 1]
        wall = time.time() - t0

        ident_q = np.array([[1.0, 0, 0, 0]], np.float32)
        zero_t = np.zeros((1, 3), np.float32)
        lidar_q = np.concatenate([ident_q, lidar_q_d])[:n]
        lidar_t = np.concatenate([zero_t, lidar_t_d])[:n]
        # frame 0 visual pose = identity mapped through the extrinsic chain
        # (== identity, since T_lidar_cam ∘ I ∘ T_cam_lidar = I)
        vis_q = np.concatenate([ident_q, vis_q])[:n]
        vis_t = np.concatenate([zero_t, vis_t])[:n]
        mapped_q = mapped_t = None
        if mapping:
            mapped_q = np.concatenate(
                [ident_q, gather(mapq, "traj_m_q", 4)])[:n]
            mapped_t = np.concatenate(
                [zero_t, gather(mapt, "traj_m_t", 3)])[:n]

        done = max(n - start, 1)
        if progress:
            print(f"cam-lidar fused: {n} frames ({done} computed) in "
                  f"{wall:.2f}s → {done / wall:.1f} fps")
        self.last_wall = wall
        return CamLidarResult(
            lidar_positions=lidar_t, visual_positions=vis_t,
            lidar_quats=lidar_q, visual_quats=vis_q,
            mapped_positions=mapped_t, mapped_quats=mapped_q,
        )
