"""Gauss-Newton 2D scan-match refinement.

TPU-native replacement for CeresScanMatcher2D
(ref: internal/2d/scan_matching/ceres_scan_matcher_2d.cc — occupied-space
cost via bicubic interpolation, occupied_space_cost_function_2d.cc:47-74;
TSDF cost via InterpolatedTSDF2D, tsdf_match_cost_function_2d.cc; plus
translation/rotation delta penalties). The Ceres autodiff + solve is
replaced by solvers.gauss_newton.levenberg_marquardt with jax.jacfwd.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.grids import ProbabilityGrid, TSDFGrid
from hectorgrapher_tpu.mapping.scan_matching.interpolated_grid import (
    interp_prepared_2d,
    prepare_probability_2d,
    prepare_tsdf_2d,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.solvers.gauss_newton import levenberg_marquardt, make_pose2_retract
from hectorgrapher_tpu.transform.rigid import Rigid2, apply2


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def match_gn_2d_probability(
    grid: ProbabilityGrid,
    cloud: PointCloud,
    initial_pose: Rigid2,
    target_translation,
    occupied_space_weight,
    translation_weight,
    rotation_weight,
    num_iterations: int = 20,
) -> Tuple[Rigid2, jax.Array]:
    """Refine pose against an occupancy grid.

    Residuals (ref: ceres_scan_matcher_2d.cc:84-120):
      * occupied space: w_o/sqrt(N) * (1 - P(T p_i)) per point
      * translation: w_t * (t - target_translation)
      * rotation: w_r * (theta - theta0)
    """
    valid = cloud.mask
    n = jnp.maximum(jnp.sum(valid), 1)
    pts = cloud.positions[:, :2]
    theta0 = initial_pose.angle
    # Bicubic patch matrix built once, hoisted out of the LM iterations.
    prepared = prepare_probability_2d(grid)

    def residual(pose: Rigid2):
        world = apply2(pose, pts)
        p = interp_prepared_2d(prepared, world)
        occ = jnp.where(valid, 1.0 - p, 0.0) * (occupied_space_weight / jnp.sqrt(n.astype(jnp.float32)))
        trans = translation_weight * (pose.translation - target_translation)
        rot = rotation_weight * (pose.angle - theta0)
        return jnp.concatenate([occ, trans, rot[None]])

    result = levenberg_marquardt(
        residual,
        initial_pose,
        make_pose2_retract(),
        tangent_dim=3,
        num_iterations=num_iterations,
    )
    return result.x, result.final_cost


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def match_gn_2d_tsdf(
    grid: TSDFGrid,
    cloud: PointCloud,
    initial_pose: Rigid2,
    target_translation,
    occupied_space_weight,
    translation_weight,
    rotation_weight,
    num_iterations: int = 20,
) -> Tuple[Rigid2, jax.Array]:
    """Refine pose against a 2D TSDF (ref: tsdf_match_cost_function_2d.cc —
    residual is the interpolated TSD at each transformed point)."""
    valid = cloud.mask
    n = jnp.maximum(jnp.sum(valid), 1)
    pts = cloud.positions[:, :2]
    theta0 = initial_pose.angle
    prepared = prepare_tsdf_2d(grid)

    def residual(pose: Rigid2):
        world = apply2(pose, pts)
        tsd = interp_prepared_2d(prepared.tsd_field, world)
        w = interp_prepared_2d(prepared.weight_field, world)
        # Cells never observed carry no signal: weight-gate the residual.
        gate = jnp.where(w > 1e-6, 1.0, 0.0)
        occ = jnp.where(valid, tsd * gate, 0.0) * (occupied_space_weight / jnp.sqrt(n.astype(jnp.float32)))
        trans = translation_weight * (pose.translation - target_translation)
        rot = rotation_weight * (pose.angle - theta0)
        return jnp.concatenate([occ, trans, rot[None]])

    result = levenberg_marquardt(
        residual,
        initial_pose,
        make_pose2_retract(),
        tangent_dim=3,
        num_iterations=num_iterations,
    )
    return result.x, result.final_cost
