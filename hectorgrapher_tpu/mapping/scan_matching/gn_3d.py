"""Gauss-Newton 3D scan-match refinement.

TPU-native replacement for CeresScanMatcher3D
(ref: internal/3d/scan_matching/ceres_scan_matcher_3d.{h,cc} — per-grid
weighted occupied-space/TSDF costs over the {high, low} resolution pair,
translation/rotation delta penalties, quaternion parameterization,
optional only_optimize_yaw).

Like gn_2d, the LM loop carries the gathered trilinear patch rows across
iterations (one gather pass per iteration) and computes the grid-residual
Jacobian analytically — identical values to jacfwd, since the gather
index (floor) has zero derivative. The small delta-penalty blocks keep
autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.scan_matching.interpolated_grid import (
    PreparedTsdf3D,
    gather_rows_3d,
    prepare_grid_3d,
    prob_value_and_dfrac,
    tsdf_value_and_dfrac,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.rigid import (
    Rigid3,
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_axis_angle,
)


def _gather(prepared, world):
    """(N, 4, 128) z-segment stencil rows for one grid at world positions."""
    return gather_rows_3d(prepared, world)


def _value_and_dfrac(prepared, rows, world):
    """Match-cost value (N,) and its d/dfrac (N, 3) from carried rows.

    Identical to autodiff of value_at_prepared_3d: the weight gate's
    derivative is zero a.e., and the gathered rows are constants."""
    if isinstance(prepared, PreparedTsdf3D):
        return tsdf_value_and_dfrac(prepared, rows, world)
    return prob_value_and_dfrac(prepared, rows, world)


def _meta_of(prepared):
    return prepared.meta


def _skew_apply(p, world_rot):
    """Columns of -R [p]x: dworld/dtheta for right-multiplied boxplus.
    world_rot(v) applies R(q). Returns (N, 3, 3): [..., i, k] = d world_i /
    d theta_k."""
    # d world / d theta_k = R (e_k x p) = -R (p x e_k)
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), p.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), p.shape)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), p.shape)
    cols = [world_rot(jnp.cross(e, p)) for e in (ex, ey, ez)]
    return jnp.stack(cols, axis=-1)  # (N, 3, 3)


@functools.partial(jax.jit, static_argnames=("num_iterations", "only_optimize_yaw"))
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
    num_iterations: int = 10,
    only_optimize_yaw: bool = False,
) -> Tuple[Rigid3, jax.Array]:
    """Refine pose against the high/low-resolution grid pair."""
    n_hi = jnp.maximum(jnp.sum(high_cloud.mask), 1).astype(jnp.float32)
    n_lo = jnp.maximum(jnp.sum(low_cloud.mask), 1).astype(jnp.float32)
    q0 = initial_pose.rotation
    translation_weight = jnp.asarray(translation_weight, jnp.float32)
    rotation_weight = jnp.asarray(rotation_weight, jnp.float32)
    target_translation = jnp.asarray(target_translation, jnp.float32)
    s_hi = jnp.asarray(occupied_space_weight_0, jnp.float32) / jnp.sqrt(n_hi)
    s_lo = jnp.asarray(occupied_space_weight_1, jnp.float32) / jnp.sqrt(n_lo)

    prepared_hi = prepare_grid_3d(high_grid)
    prepared_lo = prepare_grid_3d(low_grid)

    if only_optimize_yaw:
        # (ref: ceres_scan_matcher_3d yaw-only parameterization)
        fixed = jnp.asarray([False, False, False, True, True, False])
    else:
        fixed = jnp.zeros(6, bool)

    def world_of(pose, pts):
        return quat_rotate(pose.rotation[None, :], pts) + pose.translation[None, :]

    def gather_all(pose):
        return (
            _gather(prepared_hi, world_of(pose, high_cloud.positions)),
            _gather(prepared_lo, world_of(pose, low_cloud.positions)),
        )

    def penalty_residual(pose):
        trans = translation_weight * (pose.translation - target_translation)
        dq = quat_multiply(quat_conjugate(q0), pose.rotation)
        rot = rotation_weight * quat_to_axis_angle(dq)
        return jnp.concatenate([trans, rot])

    def grid_terms(pose, rows, prepared, cloud, scale):
        world = world_of(pose, cloud.positions)
        val, dval_dfrac = _value_and_dfrac(prepared, rows, world)
        r = jnp.where(cloud.mask, val, 0.0) * scale
        return r, dval_dfrac

    def cost_at(pose, rows_hi, rows_lo):
        r_hi, _ = grid_terms(pose, rows_hi, prepared_hi, high_cloud, s_hi)
        r_lo, _ = grid_terms(pose, rows_lo, prepared_lo, low_cloud, s_lo)
        pen = penalty_residual(pose)
        return 0.5 * (jnp.sum(r_hi * r_hi) + jnp.sum(r_lo * r_lo) + jnp.sum(pen * pen))

    def grid_jacobian(pose, rows, prepared, cloud, scale):
        r, dval_dfrac = grid_terms(pose, rows, prepared, cloud, scale)
        res = _meta_of(prepared).resolution
        # d frac / d world = 1/res; d world/dt = I; d world/dtheta = R(e_k x p).
        dv = dval_dfrac * (jnp.where(cloud.mask, 1.0, 0.0) * scale)[..., None] / res  # (N,3)
        rot_cols = _skew_apply(cloud.positions, lambda v: quat_rotate(pose.rotation[None, :], v))
        j_t = dv  # (N, 3)
        j_r = jnp.einsum("ni,nik->nk", dv, rot_cols)  # (N, 3)
        return r, jnp.concatenate([j_t, j_r], axis=-1)  # (N, 6)

    def cond(carry):
        it, done = carry[0], carry[1]
        return (it < num_iterations) & ~done

    def step(carry):
        # Ceres-style function_tolerance termination (see gn_2d).
        it, done, pose, lam, rows_hi, rows_lo, cost = carry
        r_hi, J_hi = grid_jacobian(pose, rows_hi, prepared_hi, high_cloud, s_hi)
        r_lo, J_lo = grid_jacobian(pose, rows_lo, prepared_lo, low_cloud, s_lo)

        def pen_of(delta6):
            p = Rigid3(
                translation=pose.translation + delta6[:3],
                rotation=quat_normalize(quat_multiply(pose.rotation, quat_from_axis_angle(delta6[3:6]))),
            )
            return penalty_residual(p)

        z6 = jnp.zeros(6, jnp.float32)
        r_pen = pen_of(z6)
        J_pen = jax.jacfwd(pen_of)(z6)

        J = jnp.concatenate([J_hi, J_lo, J_pen], axis=0)
        r = jnp.concatenate([r_hi, r_lo, r_pen])
        J = jnp.where(fixed[None, :], 0.0, J)
        jtj = J.T @ J
        g = J.T @ r

        diag = jnp.diagonal(jtj)
        damped = jtj + lam * jnp.diag(jnp.maximum(diag, 1e-12)) + 1e-12 * jnp.eye(6, dtype=jtj.dtype)
        delta = -jnp.linalg.solve(damped, g)
        delta = jnp.where(fixed, 0.0, delta)
        pose_new = Rigid3(
            translation=pose.translation + delta[:3],
            rotation=quat_normalize(quat_multiply(pose.rotation, quat_from_axis_angle(delta[3:6]))),
        )
        rows_hi_new, rows_lo_new = gather_all(pose_new)
        cost_new = cost_at(pose_new, rows_hi_new, rows_lo_new)
        # ~done freezes converged lanes under vmap (see gn_2d).
        accept = (cost_new < cost) & ~done
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), jnp.minimum(lam * 4.0, 1e6))
        sel = lambda a, b: jnp.where(accept, b, a)
        pose_next = jax.tree.map(sel, pose, pose_new)
        rows_hi_next = jax.tree.map(sel, rows_hi, rows_hi_new)
        rows_lo_next = jax.tree.map(sel, rows_lo, rows_lo_new)
        cost_next = jnp.where(accept, cost_new, cost)
        x_norm = jnp.sqrt(jnp.sum(pose.translation**2) + 1.0)  # unit quat
        done_next = (
            done
            | (accept & (cost - cost_new <= 1e-6 * cost))
            | (jnp.linalg.norm(delta) <= 1e-7 * (x_norm + 1e-7))
        )
        return (it + 1, done_next, pose_next, lam_next, rows_hi_next, rows_lo_next, cost_next)

    rows_hi0, rows_lo0 = gather_all(initial_pose)
    cost0 = cost_at(initial_pose, rows_hi0, rows_lo0)
    carry = jax.lax.while_loop(
        cond,
        step,
        (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            initial_pose,
            jnp.asarray(1e-4, jnp.float32),
            rows_hi0,
            rows_lo0,
            cost0,
        ),
    )
    return carry[2], carry[6]


def match_gn_3d_batched(
    high_grids,
    low_grids,
    high_clouds: PointCloud,
    low_clouds: PointCloud,
    initial_poses: Rigid3,
    target_translations,
    occupied_space_weight_0,
    occupied_space_weight_1,
    translation_weight,
    rotation_weight,
    num_iterations: int = 10,
):
    """Batched CeresScanMatcher3D refinement, one (node, submap) candidate
    per lane — grids stacked leaf-wise with a leading batch axis so every
    lane refines against its OWN submap pair (ref: constraint_builder_3d.cc
    ComputeConstraint:258-269, one thread-pool task per candidate).
    Converged lanes freeze, so per-lane results equal the serial solve."""
    return jax.vmap(
        lambda hg, lg, hc, lc, ip, tt: match_gn_3d(
            hg, lg, hc, lc, ip, tt,
            occupied_space_weight_0, occupied_space_weight_1,
            translation_weight, rotation_weight,
            num_iterations=num_iterations,
        ),
        in_axes=(0, 0, 0, 0, 0, 0),
    )(high_grids, low_grids, high_clouds, low_clouds, initial_poses, target_translations)
