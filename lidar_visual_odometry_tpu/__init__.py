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
