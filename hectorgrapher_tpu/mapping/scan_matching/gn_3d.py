"""Gauss-Newton 3D scan-match refinement.

TPU-native replacement for CeresScanMatcher3D
(ref: internal/3d/scan_matching/ceres_scan_matcher_3d.{h,cc} — per-grid
weighted occupied-space/TSDF costs over the {high, low} resolution pair,
translation/rotation delta penalties, quaternion parameterization,
optional only_optimize_yaw).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.grids import ProbabilityGrid, TSDFGrid
from hectorgrapher_tpu.mapping.scan_matching.interpolated_grid import (
    prepare_grid_3d,
    value_at_prepared_3d,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.solvers.gauss_newton import levenberg_marquardt, make_pose3_retract
from hectorgrapher_tpu.transform.rigid import Rigid3, quat_multiply, quat_conjugate, quat_rotate, quat_to_axis_angle


@functools.partial(jax.jit, static_argnames=("is_tsdf", "num_iterations", "only_optimize_yaw"))
def match_gn_3d(
    high_grid,
    low_grid,
    high_cloud: PointCloud,
    low_cloud: PointCloud,
    initial_pose: Rigid3,
    target_translation,
    occupied_space_weight_0,
    occupied_space_weight_1,
    translation_weight,
    rotation_weight,
    is_tsdf: bool,
    num_iterations: int = 10,
    only_optimize_yaw: bool = False,
) -> Tuple[Rigid3, jax.Array]:
    """Refine pose against the high/low-resolution grid pair."""
    n_hi = jnp.maximum(jnp.sum(high_cloud.mask), 1).astype(jnp.float32)
    n_lo = jnp.maximum(jnp.sum(low_cloud.mask), 1).astype(jnp.float32)
    q0 = initial_pose.rotation

    # Patch matrices built once, hoisted out of the LM iterations.
    prepared_hi = prepare_grid_3d(high_grid)
    prepared_lo = prepare_grid_3d(low_grid)

    def grid_residual(prepared, cloud, weight, n):
        def f(pose: Rigid3):
            world = quat_rotate(pose.rotation[None, :], cloud.positions) + pose.translation[None, :]
            val = value_at_prepared_3d(prepared, world)
            return jnp.where(cloud.mask, val, 0.0) * (weight / jnp.sqrt(n))

        return f

    hi_f = grid_residual(prepared_hi, high_cloud, occupied_space_weight_0, n_hi)
    lo_f = grid_residual(prepared_lo, low_cloud, occupied_space_weight_1, n_lo)

    def residual(pose: Rigid3):
        trans = translation_weight * (pose.translation - target_translation)
        # rotation delta penalty vs initial rotation (ref: rotation_delta_
        # cost_functor_3d.h)
        dq = quat_multiply(quat_conjugate(q0), pose.rotation)
        rot = rotation_weight * quat_to_axis_angle(dq)
        return jnp.concatenate([hi_f(pose), lo_f(pose), trans, rot])

    if only_optimize_yaw:
        fixed = jnp.asarray([False, False, False, True, True, False])
    else:
        fixed = None

    result = levenberg_marquardt(
        residual,
        initial_pose,
        make_pose3_retract(),
        tangent_dim=6,
        num_iterations=num_iterations,
        fixed_mask=fixed,
    )
    return result.x, result.final_cost
