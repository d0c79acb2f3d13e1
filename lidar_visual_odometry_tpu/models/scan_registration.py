"""Scan-registration stage: raw cloud → feature clouds (≡ scanRegistration node).

One jitted device program replacing the reference's callback
(``src/scanRegistration.cpp:114-459``): range-image build + ring compaction +
curvature feature extraction. Outputs the five clouds the reference publishes
(sharp/less-sharp/flat/less-flat + full resolution) as fixed-shape tensors.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax

from ..ops import features as F
from ..ops import pointcloud as pc
from ..utils.config import LidarConfig


class RegisteredScan(NamedTuple):
    features: F.ScanFeatures
    full: pc.CompactScan  # ≡ /velodyne_cloud_2


def _extract(cs: pc.CompactScan, cfg: LidarConfig) -> F.ScanFeatures:
    return F.extract_features(
        cs,
        n_sectors=cfg.n_sectors,
        max_sharp=cfg.max_sharp_per_sector,
        max_less_sharp=cfg.max_less_sharp_per_sector,
        max_flat=cfg.max_flat_per_sector,
        edge_gate=cfg.curvature_edge_min,
        surf_gate=cfg.curvature_surf_max,
        surf_leaf=cfg.surf_leaf_size,
        max_less_flat_per_ring=cfg.max_less_flat // cfg.n_scans,
    )


def register_scan_impl(
    points: jax.Array, mask: jax.Array, cfg: LidarConfig
) -> RegisteredScan:
    cs = pc.build_compact_scan(
        points,
        mask,
        n_scans=cfg.n_scans,
        width=cfg.azimuth_bins,
        min_range=cfg.min_range,
        max_range=cfg.max_range,
    )
    return RegisteredScan(_extract(cs, cfg), cs)


def register_polar_impl(
    img: jax.Array, cfg: LidarConfig
) -> RegisteredScan:
    """Feature extraction from a packed polar image
    (``pointcloud.pack_polar_scan``) — the minimum-transfer ingest path.
    Decode lands directly on the compacted (ring, W) grid; no global sort."""
    cs = pc.polar_to_compact(
        img,
        n_scans=cfg.n_scans,
        width=cfg.azimuth_bins,
        min_range=cfg.min_range,
        max_range=cfg.max_range,
    )
    return RegisteredScan(_extract(cs, cfg), cs)


register_scan = jax.jit(register_scan_impl, static_argnames=("cfg",))
register_polar = jax.jit(register_polar_impl, static_argnames=("cfg",))
