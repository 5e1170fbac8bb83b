"""hectorgrapher_tpu: TPU-native continuous-time lidar SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tu-darmstadt-ros-pkg/hectorgrapher (continuous-time 2D/3D SLAM with
multi-resolution TSDF registration). Not a port: the numeric core is
dense-array, batched, and jit-compiled; host code orchestrates streaming.

Layer map (mirrors reference SURVEY.md section 1):
  common     - time, math, config (ref: cartographer/common)
  transform  - SO(3)/SE(3) array ops, interpolation (ref: cartographer/transform)
  sensor     - typed sensor data, voxel filters, collation (ref: cartographer/sensor)
  mapping    - grids, submaps, local SLAM, scan matching, pose graph
               (ref: cartographer/mapping)
  solvers    - damped Gauss-Newton / LM on manifolds, CG (ref: Ceres usage)
  ops        - Pallas TPU kernels for hot paths
  parallel   - jax.sharding mesh utilities for multi-host pose graphs
  io         - checkpoint serialization, points pipeline (ref: cartographer/io)
  metrics    - counters/gauges/histograms (ref: cartographer/metrics)
  evaluation - synthetic scan generation, relation metrics (ref: evaluation/)
"""

__version__ = "0.1.0"
