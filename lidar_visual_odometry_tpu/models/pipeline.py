"""Host-side odometry pipeline driver.

Replaces the reference's ROS process fabric (scanRegistration node →
laserOdometry node topics, SURVEY.md §2.4) with a plain Python loop over two
jitted device programs. Stages run back-to-back on one chip; the host only
pads the raw scan and collects pose outputs (device→host transfer is 7 floats
per frame).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..models import lidar_odometry as lo
from ..models import scan_registration as sr
from ..ops import pointcloud as pc
from ..ops import se3
from ..utils.config import SystemConfig

#: concat per-chunk device outputs on device — ONE dispatch + ONE D2H per
#: trajectory instead of an RPC round trip per chunk on the tunneled TPU
_cat = jax.jit(lambda xs: jnp.concatenate(xs))


@dataclass
class TrajectoryResult:
    positions: np.ndarray      # (N, 3)
    quaternions: np.ndarray    # (N, 4) wxyz
    per_frame_s: list = field(default_factory=list)


class OdometryPipeline:
    """scan → features → scan-to-scan pose, frame by frame."""

    def __init__(self, cfg: SystemConfig = SystemConfig(), capacity: int = 131072):
        self.cfg = cfg
        self.capacity = capacity
        self.odom = lo.LidarOdometry(cfg.odometry)

    def process_scan(self, points: np.ndarray) -> se3.Pose:
        """Feed one raw (N, ≥3) scan; returns the current world pose."""
        xyz, mask = pc.pad_points(points[:, :3], self.capacity)
        reg = sr.register_scan(jnp.asarray(xyz), jnp.asarray(mask), self.cfg.lidar)
        pose_w, _ = self.odom.process(reg.features)
        return pose_w

    def run(self, scans, progress: bool = False) -> TrajectoryResult:
        """Run the whole sequence with fully asynchronous dispatch.

        No per-frame host sync: each frame's pose stays on device and the host
        immediately dispatches the next frame (host↔device round-trip latency
        is ~30 ms in the tunneled-TPU environment — blocking per frame would
        dominate the budget). One block at the end drains the pipeline.
        """
        import time

        import jax

        t0 = time.time()
        poses = [self.process_scan(np.asarray(pts)) for pts in scans]
        jax.block_until_ready(poses[-1])
        wall = time.time() - t0

        qs = np.stack([np.asarray(p.q) for p in poses])
        ts = np.stack([np.asarray(p.t) for p in poses])
        if progress:
            print(f"{len(scans)} frames in {wall:.2f}s → {len(scans)/wall:.1f} fps")
        return TrajectoryResult(ts, qs, per_frame_s=[wall / len(scans)] * len(scans))

    def run_chunked(
        self, scans, chunk: int = 8, progress: bool = False,
        quantize: bool = False, ingest: str | None = None,
        checkpoint_path: str | None = None, checkpoint_every: int = 0,
        resume: bool = False, stop_after: int | None = None,
    ) -> TrajectoryResult:
        """Batch-process the sequence in K-frame device programs
        (lidar_odometry.odometry_chunk): one dispatch per chunk instead of
        2-3 per frame — the fast path when scans are available in advance
        (dataset eval / benchmark) or arrive in bursts.

        ingest selects the upload encoding (default derived from ``quantize``):
          * "float"  — float32 xyz + bool mask planes,
          * "uint16" — xyz quantized at 3.9 mm + per-frame counts
            (lidar_odometry.quantize_scan; half the float bytes),
          * "polar"  — packed (ring, azimuth) range image, 4 bytes/cell
            (pointcloud.pack_polar_scan; 2/3 of uint16, and the device skips
            the global compaction sort) — the transfer-bound deployment mode.
        """
        import time

        import jax

        from ..models import lidar_odometry as lo

        if ingest is None:
            ingest = "uint16" if quantize else "float"
        lcfg = self.cfg.lidar

        # Checkpoint/resume (VERDICT r4 next #2): snapshots land at chunk
        # boundaries so a resumed run replays the exact same device programs
        # on the exact same carried state — bit-exact continuation. The
        # reference loses everything on a crash (SURVEY §5).
        prefix_q = prefix_t = None
        if resume:
            from ..utils import checkpoint as ckpt

            start, state, prefix_q, prefix_t = ckpt.load_checkpoint(
                checkpoint_path
            )
            prefix_q, prefix_t = np.asarray(prefix_q), np.asarray(prefix_t)
        else:
            # frame 0 initializes the feature state
            xyz0, mask0 = pc.pad_points(
                np.asarray(scans[0])[:, :3], self.capacity
            )
            reg0 = sr.register_scan(jnp.asarray(xyz0), jnp.asarray(mask0),
                                    lcfg)
            state = lo.init_state(reg0.features)
            start = 1

        host_q: list = []   # host copies of already-fetched chunks — each
        host_t: list = []   # save pulls only the NEW chunks (a full-traj
                            # _cat per save would be O(N²) D2H and a fresh
                            # remote compile per distinct chunk count)

        def maybe_checkpoint(next_s, chunks_q, chunks_t):
            """Write a snapshot covering frames [0, next_s); returns True
            when the run should stop (``stop_after`` reached)."""
            if checkpoint_path and checkpoint_every > 0 and (
                next_s - maybe_checkpoint.last >= checkpoint_every
                or (stop_after is not None and next_s > stop_after)
            ):
                from ..utils import checkpoint as ckpt

                for c in chunks_q[len(host_q):]:
                    host_q.append(np.asarray(c))
                for c in chunks_t[len(host_t):]:
                    host_t.append(np.asarray(c))
                got_q = (np.concatenate(host_q) if host_q
                         else np.zeros((0, 4), np.float32))
                got_t = (np.concatenate(host_t) if host_t
                         else np.zeros((0, 3), np.float32))
                if prefix_q is not None:
                    tq = np.concatenate([prefix_q, got_q])
                    tt = np.concatenate([prefix_t, got_t])
                else:
                    tq = np.concatenate(
                        [[np.array([1.0, 0, 0, 0], np.float32)], got_q])
                    tt = np.concatenate([np.zeros((1, 3), np.float32), got_t])
                ckpt.save_checkpoint(
                    checkpoint_path, frame_idx=next_s, odom_state=state,
                    trajectory_q=tq[:next_s], trajectory_t=tt[:next_s],
                )
                maybe_checkpoint.last = next_s
            return stop_after is not None and next_s > stop_after

        maybe_checkpoint.last = start

        t0 = time.time()
        # per chunk: pack (host numpy) → upload → dispatch (async). Because
        # dispatch returns immediately, packing chunk k+1 overlaps chunk k's
        # device compute; only the transfers serialize with compute on the
        # tunneled TPU. (Packing everything up front instead adds the full
        # host pack time to the critical path.)
        # The final ragged batch pads to `chunk` frames (count/mask 0) so
        # every dispatch reuses the one compiled K=chunk program (a second
        # remote XLA compile costs minutes); padded outputs are dropped below
        chunks_q, chunks_t = [], []
        n_done = len(scans)
        for s in range(start, len(scans), chunk):
            batch = scans[s:s + chunk]
            if ingest.startswith("polar"):
                from ..data.native_pack import pack_polar_chunk

                # "polar2" = range-only 2 B/cell (offsets dropped; decode at
                # cell centers — measured ATE cost on BASELINE.md)
                imgs = pack_polar_chunk(
                    batch, n_scans=lcfg.n_scans, width=lcfg.azimuth_bins,
                    min_range=lcfg.min_range, max_range=lcfg.max_range,
                    n_frames=chunk, channels=1 if ingest == "polar2" else 2,
                )
                state, poses = lo.odometry_chunk_polar(
                    state, jnp.asarray(imgs), lcfg, self.cfg.odometry,
                )
            elif ingest == "uint16":
                qs = np.zeros((chunk, self.capacity, 3), np.uint16)
                counts = np.zeros((chunk,), np.int32)
                for i, pts in enumerate(batch):
                    qs[i], counts[i] = lo.quantize_scan(
                        np.asarray(pts), self.capacity
                    )
                state, poses = lo.odometry_chunk_quantized(
                    state, jnp.asarray(qs), jnp.asarray(counts),
                    lcfg, self.cfg.odometry,
                )
            else:
                stacked = np.zeros((chunk, self.capacity, 3), np.float32)
                masks = np.zeros((chunk, self.capacity), bool)
                for i, pts in enumerate(batch):
                    stacked[i], masks[i] = pc.pad_points(
                        np.asarray(pts)[:, :3], self.capacity
                    )
                state, poses = lo.odometry_chunk(
                    state, jnp.asarray(stacked), jnp.asarray(masks),
                    lcfg, self.cfg.odometry,
                )
            chunks_q.append(poses.q)
            chunks_t.append(poses.t)
            if maybe_checkpoint(min(s + chunk, len(scans)), chunks_q,
                                chunks_t):
                n_done = min(s + chunk, len(scans))
                break
        if chunks_q:
            all_q = np.asarray(_cat(chunks_q))
            all_t = np.asarray(_cat(chunks_t))
        else:
            all_q = np.zeros((0, 4), np.float32)
            all_t = np.zeros((0, 3), np.float32)
        wall = time.time() - t0

        n = n_done
        if prefix_q is not None:
            qs = np.concatenate([prefix_q, all_q])[:n]
            ts = np.concatenate([prefix_t, all_t])[:n]
        else:
            qs = np.concatenate(
                [[np.array([1.0, 0, 0, 0], np.float32)], all_q])[:n]
            ts = np.concatenate([[np.zeros(3, np.float32)], all_t])[:n]
        done = max(n - start, 1)   # frames COMPUTED this call (resume
                                   # replays nothing — fps over the full
                                   # length would be fabricated)
        if progress:
            print(f"{n} frames ({done} computed) in {wall:.2f}s → "
                  f"{done/wall:.1f} fps")
        return TrajectoryResult(ts, qs, per_frame_s=[wall / done] * n)


class FullPipeline:
    """Odometry + scan-to-map refinement (≡ scanRegistration → laserOdometry
    → laserMapping chain).

    Mapping consumes the odometry stream at its own cadence
    (``mapping_skip_frame``), exactly like the reference's decoupled mapping
    thread (laserMapping.cpp:934): the odometry fast path stays fully
    asynchronous; the mapping stage syncs with the host for cube bookkeeping.
    """

    def __init__(self, cfg: SystemConfig = SystemConfig(), capacity: int = 131072,
                 device_map: bool = True):
        """device_map=True (default) keeps the local map resident on device
        (models/device_mapping.py) — zero per-frame submap transfers, fully
        pipelined dispatch. device_map=False uses the host cube-map driver
        (faithful unbounded store, one submap upload + host sync per frame)."""
        from ..models import device_mapping as dm
        from ..models import lidar_mapping as lm

        self.cfg = cfg
        self.capacity = capacity
        self.odom = lo.LidarOdometry(cfg.odometry)
        self.device_map = device_map
        self.mapper = (
            dm.DeviceMapping(cfg.mapping) if device_map
            else lm.LidarMapping(cfg.mapping)
        )

    def run(self, scans, progress: bool = False):
        """Returns (odometry TrajectoryResult, mapped TrajectoryResult)."""
        import time

        import jax

        t0 = time.time()
        feats_stream = []
        odom_poses = []
        for pts in scans:
            xyz, mask = pc.pad_points(np.asarray(pts)[:, :3], self.capacity)
            reg = sr.register_scan(
                jnp.asarray(xyz), jnp.asarray(mask), self.cfg.lidar
            )
            pose_w, _ = self.odom.process(reg.features)
            feats_stream.append(reg.features)
            odom_poses.append(pose_w)

        mapped_poses = []
        skip = self.cfg.odometry.skip_frame_num
        last = None
        for k, (feats, pose) in enumerate(zip(feats_stream, odom_poses)):
            if self.device_map:
                last = self.mapper.process(feats, pose, skip=skip)
            elif k % skip == 0:
                last = self.mapper.process(feats, pose)
            else:
                last = se3.se3_compose(self.mapper.correction, pose)
            mapped_poses.append(last)
        jax.block_until_ready(mapped_poses[-1])
        wall = time.time() - t0

        def to_result(poses):
            return TrajectoryResult(
                np.stack([np.asarray(p.t) for p in poses]),
                np.stack([np.asarray(p.q) for p in poses]),
                per_frame_s=[wall / len(scans)] * len(scans),
            )

        if progress:
            print(f"odom+map: {len(scans)} frames in {wall:.2f}s")
        return to_result(odom_poses), to_result(mapped_poses)

    def run_chunked(self, scans, chunk: int = 8, progress: bool = False,
                    map_skip: int | None = None, ingest: str = "uint16",
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 0,
                    resume: bool = False, stop_after: int | None = None):
        """The fused fast path: K frames of register → scan-to-scan →
        scan-to-map → map insert per device program
        (device_mapping.slam_chunk_quantized). Requires device_map=True.

        map_skip (default cfg.odometry.skip_frame_num) maps every N-th frame
        — the reference's decoupled mapping cadence. ingest = "uint16" |
        "polar" (see OdometryPipeline.run_chunked).

        Returns (odometry TrajectoryResult, mapped TrajectoryResult).
        """
        import time

        import jax

        from ..models import device_mapping as dm
        from ..models import lidar_odometry as lo

        assert self.device_map, "run_chunked requires the device-resident map"

        # Checkpoint/resume at chunk boundaries (see
        # OdometryPipeline.run_chunked): the map-state pytree rides along so
        # the resumed run continues against the same device voxel map.
        prefix = None
        if resume:
            from ..utils import checkpoint as ckpt

            start, odo_state, pq, pt = ckpt.load_checkpoint(checkpoint_path)
            map_state = ckpt.load_map_state(
                checkpoint_path, dm.init_state(self.cfg.mapping)
            )
            data = np.load(checkpoint_path)
            prefix = (np.asarray(pq), np.asarray(pt),
                      np.asarray(data["traj_map_q"]),
                      np.asarray(data["traj_map_t"]))
        else:
            xyz0, mask0 = pc.pad_points(
                np.asarray(scans[0])[:, :3], self.capacity
            )
            reg0 = sr.register_scan(
                jnp.asarray(xyz0), jnp.asarray(mask0), self.cfg.lidar
            )
            odo_state = lo.init_state(reg0.features)
            map_state = dm.init_state(self.cfg.mapping)
            start = 1

        t0 = time.time()
        if map_skip is None:
            map_skip = self.cfg.odometry.skip_frame_num
        # per chunk: pack → upload → async dispatch, so packing chunk k+1
        # overlaps chunk k's device compute (see OdometryPipeline.run_chunked).
        # The final ragged batch pads to `chunk` (counts 0) — one compiled
        # program for every dispatch; padded outputs are dropped below
        lcfg = self.cfg.lidar
        chunks = []
        host4: list = []   # host copies of fetched chunks (incremental —
                           # see OdometryPipeline.maybe_checkpoint)
        n_done = len(scans)
        last_saved = start
        for s in range(start, len(scans), chunk):
            batch = scans[s:s + chunk]
            if ingest.startswith("polar"):
                from ..data.native_pack import pack_polar_chunk

                imgs = pack_polar_chunk(
                    batch, n_scans=lcfg.n_scans, width=lcfg.azimuth_bins,
                    min_range=lcfg.min_range, max_range=lcfg.max_range,
                    n_frames=chunk, channels=1 if ingest == "polar2" else 2,
                )
                odo_state, map_state, op, mp = dm.slam_chunk_polar(
                    odo_state, map_state, jnp.asarray(imgs),
                    lcfg, self.cfg.odometry, self.cfg.mapping,
                    start_idx=s, map_skip=map_skip,
                )
            else:
                qs = np.zeros((chunk, self.capacity, 3), np.uint16)
                counts = np.zeros((chunk,), np.int32)
                for i, pts in enumerate(batch):
                    qs[i], counts[i] = lo.quantize_scan(
                        np.asarray(pts), self.capacity
                    )
                odo_state, map_state, op, mp = dm.slam_chunk_quantized(
                    odo_state, map_state, jnp.asarray(qs), jnp.asarray(counts),
                    lcfg, self.cfg.odometry, self.cfg.mapping,
                    start_idx=s, map_skip=map_skip,
                )
            chunks.append((op.q, op.t, mp.q, mp.t))
            next_s = min(s + chunk, len(scans))
            stop = stop_after is not None and next_s > stop_after
            if checkpoint_path and checkpoint_every > 0 and (
                next_s - last_saved >= checkpoint_every or stop
            ):
                from ..utils import checkpoint as ckpt

                for c in chunks[len(host4):]:
                    host4.append(tuple(np.asarray(x) for x in c))
                got = [np.concatenate([h[i] for h in host4])
                       for i in range(4)]
                iq = np.array([[1.0, 0, 0, 0]], np.float32)
                zt = np.zeros((1, 3), np.float32)
                if prefix is not None:
                    tq, tt, tmq, tmt = (
                        np.concatenate([p, g])
                        for p, g in zip(prefix, (got[0], got[1],
                                                 got[2], got[3]))
                    )
                else:
                    tq = np.concatenate([iq, got[0]])
                    tt = np.concatenate([zt, got[1]])
                    tmq = np.concatenate([iq, got[2]])
                    tmt = np.concatenate([zt, got[3]])
                ckpt.save_checkpoint(
                    checkpoint_path, frame_idx=next_s, odom_state=odo_state,
                    trajectory_q=tq[:next_s], trajectory_t=tt[:next_s],
                    map_state=map_state,
                    extra={"traj_map_q": tmq[:next_s],
                           "traj_map_t": tmt[:next_s]},
                )
                last_saved = next_s
            if stop:
                n_done = next_s
                break
        if chunks:
            fetched = [np.asarray(_cat([c[i] for c in chunks]))
                       for i in range(4)]
        else:
            fetched = [np.zeros((0, 4), np.float32),
                       np.zeros((0, 3), np.float32)] * 2
        wall = time.time() - t0

        n = n_done
        ident_q = np.array([[1.0, 0, 0, 0]], np.float32)
        zero_t = np.zeros((1, 3), np.float32)

        def cat(first, i):
            # prefix tuple order == fetched order: (odom q, odom t,
            # map q, map t)
            if prefix is not None:
                return np.concatenate([prefix[i], fetched[i]])[:n]
            return np.concatenate([first, fetched[i]])[:n]

        done = max(n - start, 1)
        per = [wall / done] * n
        odom = TrajectoryResult(cat(zero_t, 1), cat(ident_q, 0), per_frame_s=per)
        mapped = TrajectoryResult(cat(zero_t, 3), cat(ident_q, 2), per_frame_s=per)
        if progress:
            print(f"odom+map(fused): {n} frames ({done} computed) in "
                  f"{wall:.2f}s → {done/wall:.1f} fps")
        return odom, mapped
