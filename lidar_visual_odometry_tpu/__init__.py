"""TPU-native lidar-visual odometry engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
A-LOAM + vloam pipeline (reference: ucmmesa/Lidar-Visual-Odometry):
curvature-based edge/planar feature extraction, scan-to-scan odometry with
point-to-line/point-to-plane Gauss-Newton, scan-to-map voxel refinement, a
visual frontend (KLT tracking + lidar depth association, direct photometric
tracking, sliding-window photometric BA), and a distributed mapping/BA layer
over `jax.sharding` meshes.

Subpackages:
  ops      — batched tensor kernels (SE3, features, NN, GN, image ops)
  models   — pipeline stages (scan registration, odometry, mapping, frontend)
  parallel — mesh/sharding, distributed BA
  utils    — config, profiling, logging
  data     — KITTI + synthetic dataset loaders
  eval     — trajectory metrics (ATE / t_rel)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: compiles of the jitted pipeline stages are
# expensive (tens of seconds via this environment's remote-compile tunnel);
# cache them across processes. Opt out with LVO_TPU_NO_CACHE=1.
if not _os.environ.get("LVO_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
