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

import jax
import jax.numpy as jnp

from ..models import keyframe as kfm
from ..models import tracker_direct, window_ba
from ..ops import image, se3
from ..utils.config import VisualConfig


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
                refined = window_ba.refine(
                    pyrs, pts, masks, poses, self.cam,
                    n_iters=4, level=min(1, self.cfg.pyramid_levels - 1),
                    tdist_dof=self.cfg.tdist_dof,
                )
                for i, kf in enumerate(self.window.frames):
                    self.window.frames[i] = kf._replace(
                        pose_w=se3.Pose(refined.q[i], refined.t[i])
                    )
                self.ref_kf = self.window.frames[-1]
                self.pose_w = self.ref_kf.pose_w
        return self.pose_w
