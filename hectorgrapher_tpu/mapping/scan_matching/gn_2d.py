"""Gauss-Newton 2D scan-match refinement.

TPU-native replacement for CeresScanMatcher2D
(ref: internal/2d/scan_matching/ceres_scan_matcher_2d.cc — occupied-space
cost via bicubic interpolation, occupied_space_cost_function_2d.cc:47-74;
TSDF cost via InterpolatedTSDF2D, tsdf_match_cost_function_2d.cc; plus
translation/rotation delta penalties).

The LM loop here is specialized for grid matching: the 16-tap bicubic
patch rows gathered per point are *carried across iterations* and only
re-gathered when a trial pose is evaluated — one gather pass per LM
iteration instead of two (the gather is the TPU bottleneck; the rows are
piecewise-constant in the pose, so the autodiff Jacobian through
jax.jacfwd treats them as constants anyway). The Jacobian is written out
analytically — identical values to jacfwd of the residual, since floor()
has zero derivative.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.grids import ProbabilityGrid, TSDFGrid
from hectorgrapher_tpu.mapping.scan_matching.interpolated_grid import (
    _cubic_weights_and_derivs,
    gather_rows_2d,
    prepare_probability_2d,
    prepare_tsdf_2d,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.rigid import Rigid2, rot2


def _solve3_sym(a, g):
    """Solve the symmetric 3x3 system a @ x = g via the adjugate (no LU)."""
    a00, a01, a02 = a[0, 0], a[0, 1], a[0, 2]
    a11, a12, a22 = a[1, 1], a[1, 2], a[2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    x0 = (c00 * g[0] + c01 * g[1] + c02 * g[2]) * inv_det
    x1 = (c01 * g[0] + c11 * g[1] + c12 * g[2]) * inv_det
    x2 = (c02 * g[0] + c12 * g[1] + c22 * g[2]) * inv_det
    return jnp.stack([x0, x1, x2])


def _lm_grid_2d(
    value_of_rows,
    gather_fn,
    pts,
    valid,
    scale,
    initial_pose: Rigid2,
    target_translation,
    translation_weight,
    rotation_weight,
    meta,
    num_iterations: int,
    init_lambda: float = 1e-4,
    min_lambda: float = 1e-10,
    max_lambda: float = 1e6,
):
    """Carried-rows LM over (tx, ty, theta) against a prepared 2D field.

    value_of_rows(rows, w16) -> (value, dval_scale) where `value` is the
    per-point match residual before `scale` and dval_scale gates the
    derivative (0 where the residual is hard-gated). gather_fn(world)
    returns the pytree of gathered rows for world xy positions.
    """
    theta0 = initial_pose.angle
    res = meta.resolution
    # Pin f32: weights arrive as weak f64 under the x64 test config.
    scale = jnp.asarray(scale, jnp.float32)
    translation_weight = jnp.asarray(translation_weight, jnp.float32)
    rotation_weight = jnp.asarray(rotation_weight, jnp.float32)
    target_translation = jnp.asarray(target_translation, jnp.float32)

    def world_of(pose):
        return rot2(pose.angle, pts) + pose.translation

    def terms(pose, rows):
        u = (world_of(pose) - meta.min_corner) / res - 0.5
        frac = u - jnp.floor(u)
        wx, dwx = _cubic_weights_and_derivs(frac[..., 0])
        wy, dwy = _cubic_weights_and_derivs(frac[..., 1])
        w16 = (wx[..., :, None] * wy[..., None, :]).reshape(pts.shape[0], 16)
        value, dgate = value_of_rows(rows, w16)
        r_occ = jnp.where(valid, value, 0.0) * scale
        dt = pose.translation - target_translation
        dth = pose.angle - theta0
        cost = 0.5 * (
            jnp.sum(r_occ * r_occ)
            + translation_weight**2 * jnp.sum(dt * dt)
            + rotation_weight**2 * dth * dth
        )
        aux = (rows, w16, wx, wy, dwx, dwy, dgate, dt, dth)
        return cost, r_occ, aux

    def jacobian(pose, r_occ, aux):
        rows, w16, wx, wy, dwx, dwy, dgate, dt, dth = aux
        flat = jax.tree.leaves(rows)[0]
        # d value / d frac via the separable weight derivatives.
        dwx16 = (dwx[..., :, None] * wy[..., None, :]).reshape(pts.shape[0], 16)
        dwy16 = (wx[..., :, None] * dwy[..., None, :]).reshape(pts.shape[0], 16)
        dv_dfx, dv_dfy = value_grad_rows(rows, dwx16, dwy16)
        gate = jnp.where(valid, dgate, 0.0) * scale
        dv_dfx = dv_dfx * gate
        dv_dfy = dv_dfy * gate
        # d frac / d pose: u = (R p + t - min)/res - 0.5.
        dp_dth = rot2(pose.angle + jnp.pi / 2.0, pts)  # dR/dtheta @ p
        j_tx = dv_dfx / res
        j_ty = dv_dfy / res
        j_th = (dv_dfx * dp_dth[..., 0] + dv_dfy * dp_dth[..., 1]) / res
        jocc = jnp.stack([j_tx, j_ty, j_th], axis=-1)  # (N, 3)
        jtj = jocc.T @ jocc
        g = jocc.T @ r_occ
        tw2 = translation_weight**2
        rw2 = rotation_weight**2
        jtj = jtj + jnp.diag(jnp.stack([tw2, tw2, rw2]))
        g = g + jnp.concatenate([tw2 * dt, (rw2 * dth)[None]])
        return jtj, g

    # value_grad_rows is supplied by the caller through a closure on
    # value_of_rows' structure; defined below per cost type.
    value_grad_rows = value_of_rows.grad_rows

    def step(carry, _):
        pose, lam, rows, cost = carry
        c, r_occ, aux = terms(pose, rows)
        jtj, g = jacobian(pose, r_occ, aux)
        diag = jnp.diagonal(jtj)
        damped = jtj + lam * jnp.diag(jnp.maximum(diag, 1e-12)) + 1e-12 * jnp.eye(3, dtype=jtj.dtype)
        delta = -_solve3_sym(damped, g)
        pose_new = Rigid2(translation=pose.translation + delta[:2], angle=pose.angle + delta[2])
        rows_new = gather_fn(world_of(pose_new))
        cost_new, _, _ = terms(pose_new, rows_new)
        accept = cost_new < cost
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, min_lambda), jnp.minimum(lam * 4.0, max_lambda))
        pose_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), pose, pose_new)
        rows_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), rows, rows_new)
        cost_next = jnp.where(accept, cost_new, cost)
        return (pose_next, lam_next, rows_next, cost_next), cost_next

    rows0 = gather_fn(world_of(initial_pose))
    cost0, _, _ = terms(initial_pose, rows0)
    (pose_f, _, _, cost_f), _ = jax.lax.scan(
        step,
        (initial_pose, jnp.asarray(init_lambda, jnp.float32), rows0, cost0),
        None,
        length=num_iterations,
    )
    return pose_f, cost_f


class _ProbabilityCost:
    """Occupied-space residual: 1 - P(T p) (ref: occupied_space_cost_
    function_2d.cc:47-74)."""

    def __call__(self, rows, w16):
        value = 1.0 - jnp.sum(rows * w16, axis=-1)
        return value, jnp.ones((), jnp.float32)

    @staticmethod
    def grad_rows(rows, dwx16, dwy16):
        # d(1 - sum rows*w)/dfrac = -sum rows*dw.
        return -jnp.sum(rows * dwx16, axis=-1), -jnp.sum(rows * dwy16, axis=-1)


class _TsdfCost:
    """Weight-gated TSD residual (ref: tsdf_match_cost_function_2d.cc:30,74;
    cells never observed carry no signal)."""

    def __call__(self, rows, w16):
        tsd_rows, w_rows = rows
        tsd = jnp.sum(tsd_rows * w16, axis=-1)
        w = jnp.sum(w_rows * w16, axis=-1)
        gate = jnp.where(w > 1e-6, 1.0, 0.0)
        return tsd * gate, gate

    @staticmethod
    def grad_rows(rows, dwx16, dwy16):
        tsd_rows, _ = rows
        return jnp.sum(tsd_rows * dwx16, axis=-1), jnp.sum(tsd_rows * dwy16, axis=-1)


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
    prepared = prepare_probability_2d(grid)
    scale = occupied_space_weight / jnp.sqrt(n.astype(jnp.float32))
    pose, cost = _lm_grid_2d(
        _ProbabilityCost(),
        lambda world: gather_rows_2d(prepared, world),
        pts,
        valid,
        scale,
        initial_pose,
        target_translation,
        translation_weight,
        rotation_weight,
        prepared.meta,
        num_iterations,
    )
    return pose, cost


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
    prepared = prepare_tsdf_2d(grid)
    scale = occupied_space_weight / jnp.sqrt(n.astype(jnp.float32))
    pose, cost = _lm_grid_2d(
        _TsdfCost(),
        lambda world: (
            gather_rows_2d(prepared.tsd_field, world),
            gather_rows_2d(prepared.weight_field, world),
        ),
        pts,
        valid,
        scale,
        initial_pose,
        target_translation,
        translation_weight,
        rotation_weight,
        prepared.tsd_field.meta,
        num_iterations,
    )
    return pose, cost
