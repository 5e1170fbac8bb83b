"""Differentiable grid interpolation for scan matching.

TPU-native replacement for Ceres's BiCubicInterpolator over 2D grids
(ref: internal/2d/scan_matching/occupied_space_cost_function_2d.cc:47-74)
and the trilinear InterpolatedGrid/InterpolatedTSDF wrappers
(ref: internal/3d/scan_matching/interpolated_grid.h, interpolated_tsdf.h,
interpolated_multi_resolution_tsdf.h).

All functions map float positions to interpolated values with JAX-autodiff
gradients, batched over points. Out-of-bounds reads clamp to the border
value, matching the reference's GridArrayAdapter padding with
kMaxCorrespondenceCost / max TSD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid, TSDFGrid


def _cubic_weights(t):
    """Catmull-Rom cubic convolution weights for offsets (-1, 0, 1, 2)."""
    t2 = t * t
    t3 = t2 * t
    w0 = 0.5 * (-t3 + 2 * t2 - t)
    w1 = 0.5 * (3 * t3 - 5 * t2 + 2)
    w2 = 0.5 * (-3 * t3 + 4 * t2 + t)
    w3 = 0.5 * (t3 - t2)
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def _cubic_weights_and_derivs(t):
    """Catmull-Rom weights and their d/dt, for analytic Jacobians."""
    t2 = t * t
    t3 = t2 * t
    w = jnp.stack(
        [
            0.5 * (-t3 + 2 * t2 - t),
            0.5 * (3 * t3 - 5 * t2 + 2),
            0.5 * (-3 * t3 + 4 * t2 + t),
            0.5 * (t3 - t2),
        ],
        axis=-1,
    )
    dw = jnp.stack(
        [
            0.5 * (-3 * t2 + 4 * t - 1),
            0.5 * (9 * t2 - 10 * t),
            0.5 * (-9 * t2 + 8 * t + 1),
            0.5 * (3 * t2 - 2 * t),
        ],
        axis=-1,
    )
    return w, dw


def gather_rows_2d(field: "PreparedField2D", points):
    """One contiguous 16-tap row gather per point at world xy positions.

    Returns (N, 16) f32 rows; out-of-grid bases hit the pad row. Split out
    from interp_prepared_2d so solvers can carry the rows across LM
    iterations (the base cell — hence the rows — only changes when the
    pose moves, so one gather per accepted trial suffices)."""
    nx, ny = field.dims[0], field.dims[1]
    u = (points - field.meta.min_corner) / field.meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    ok = (i0[..., 0] >= 0) & (i0[..., 0] < nx) & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
    flat = jnp.where(ok, i0[..., 0] * ny + i0[..., 1], nx * ny)
    return field.patches[flat].astype(jnp.float32)


def _patch_matrix_2d(values, pad_value, taps):
    """(nx*ny + 1, T) matrix of shifted copies: row c holds values at
    c + tap for each tap, border/overflow reads = pad_value; the appended
    last row is all pad_value for out-of-grid bases.

    TPU layout trick (same as the correlative kernel): interpolation taps
    become ONE contiguous row gather instead of T scattered element
    gathers. The matrix is loop-invariant in GN solves, so XLA hoists its
    construction out of the iteration loop.
    """
    nx, ny = values.shape
    lo = min(t[0] for t in taps + [(0, 0)])
    hi = max(t[0] for t in taps + [(0, 0)])
    pad = max(-lo, hi, 1)
    padded = jnp.pad(values, pad, constant_values=pad_value)
    cols = [
        jax.lax.dynamic_slice(padded, (pad + dx, pad + dy), (nx, ny)).reshape(-1)
        for dx, dy in taps
    ]
    m = jnp.stack(cols, axis=-1)
    return jnp.concatenate([m, jnp.full((1, len(taps)), pad_value, values.dtype)], axis=0)


_BICUBIC_TAPS_2D = [(dx, dy) for dx in range(-1, 3) for dy in range(-1, 3)]


def interp_bicubic_2d(values, meta: GridMeta, points, pad_value):
    """Bicubic interpolation of a 2D array at world positions (..., 2).

    values: (nx, ny) array. Out-of-grid reads return pad_value.
    """
    nx, ny = values.shape
    # Continuous cell coordinates: cell centers at integer coordinates.
    u = (points - meta.min_corner) / meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0

    wx = _cubic_weights(frac[..., 0])  # (..., 4)
    wy = _cubic_weights(frac[..., 1])
    w = (wx[..., :, None] * wy[..., None, :]).reshape(points.shape[:-1] + (16,))

    patches = _patch_matrix_2d(values, pad_value, _BICUBIC_TAPS_2D)
    ok = (i0[..., 0] >= 0) & (i0[..., 0] < nx) & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
    flat = jnp.where(ok, i0[..., 0] * ny + i0[..., 1], nx * ny)
    rows = patches[flat].astype(jnp.float32)  # (..., 16) contiguous
    return jnp.sum(rows * w, axis=-1)


def interp_bilinear_2d(values, meta: GridMeta, points, pad_value):
    nx, ny = values.shape
    u = (points - meta.min_corner) / meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    out = jnp.zeros(points.shape[:-1], values.dtype)
    for dx in range(2):
        ix = i0[..., 0] + dx
        ok_x = (ix >= 0) & (ix < nx)
        ixc = jnp.clip(ix, 0, nx - 1)
        wx = jnp.where(dx == 0, 1.0 - frac[..., 0], frac[..., 0])
        for dy in range(2):
            iy = i0[..., 1] + dy
            ok = ok_x & (iy >= 0) & (iy < ny)
            iyc = jnp.clip(iy, 0, ny - 1)
            wy = jnp.where(dy == 0, 1.0 - frac[..., 1], frac[..., 1])
            v = jnp.where(ok, values[ixc, iyc], pad_value)
            out = out + wx * wy * v
    return out


def _patch_matrix_3d(values, pad_value):
    """(nx*ny*nz + 1, 8) shifted-copy matrix for the trilinear taps."""
    nx, ny, nz = values.shape
    padded = jnp.pad(values, ((0, 1), (0, 1), (0, 1)), constant_values=pad_value)
    cols = [
        jax.lax.dynamic_slice(padded, (dx, dy, dz), (nx, ny, nz)).reshape(-1)
        for dx in range(2)
        for dy in range(2)
        for dz in range(2)
    ]
    m = jnp.stack(cols, axis=-1)
    return jnp.concatenate([m, jnp.full((1, 8), pad_value, values.dtype)], axis=0)


def interp_trilinear_3d(values, meta: GridMeta, points, pad_value):
    """Trilinear interpolation of a 3D array at world positions (..., 3).

    (ref: interpolated_grid.h InterpolatedGrid::GetProbability — trilinear
    with autodiff-compatible types.) Uses one contiguous 8-wide row gather
    per point (see _patch_matrix_2d).
    """
    nx, ny, nz = values.shape
    u = (points - meta.min_corner) / meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = (wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]).reshape(
        points.shape[:-1] + (8,)
    )

    patches = _patch_matrix_3d(values, pad_value)
    ok = (
        (i0[..., 0] >= 0) & (i0[..., 0] < nx)
        & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
        & (i0[..., 2] >= 0) & (i0[..., 2] < nz)
    )
    flat = jnp.where(ok, (i0[..., 0] * ny + i0[..., 1]) * nz + i0[..., 2], nx * ny * nz)
    rows = patches[flat].astype(jnp.float32)
    return jnp.sum(rows * w, axis=-1)


# ---------------------------------------------------------------------------
# Typed wrappers
# ---------------------------------------------------------------------------


def probability_at_2d(grid: ProbabilityGrid, points, bicubic: bool = True):
    """Occupancy probability at world xy positions; unknown/outside -> 0.1."""
    from hectorgrapher_tpu.mapping import probability_values as pv

    prob = grid.probability()
    fn = interp_bicubic_2d if bicubic else interp_bilinear_2d
    return fn(prob, grid.meta, points, pv.MIN_PROBABILITY)


def tsd_at_2d(grid: TSDFGrid, points, bicubic: bool = True):
    """(tsd, weight) at world xy positions; unknown/outside -> (td, 0)."""
    fn = interp_bicubic_2d if bicubic else interp_bilinear_2d
    tsd = fn(grid.tsd, grid.meta, points, grid.truncation_distance)
    w = fn(grid.weight, grid.meta, points, 0.0)
    return tsd, w


def probability_at_3d(grid: ProbabilityGrid, points):
    from hectorgrapher_tpu.mapping import probability_values as pv

    return interp_trilinear_3d(grid.probability(), grid.meta, points, pv.MIN_PROBABILITY)


def tsd_at_3d(grid: TSDFGrid, points):
    tsd = interp_trilinear_3d(grid.tsd, grid.meta, points, grid.truncation_distance)
    w = interp_trilinear_3d(grid.weight, grid.meta, points, 0.0)
    return tsd, w


def tsd_at_3d_weighted(grid: TSDFGrid, points):
    """Weight-aware TSD interpolation: cells with zero weight do not pull
    the estimate toward the +td prior (ref: interpolated_multi_resolution_
    tsdf.h:38-58 weight-aware lerp). Returns (tsd, weight)."""
    wsum = interp_trilinear_3d(grid.weight, grid.meta, points, 0.0)
    wtsd = interp_trilinear_3d(grid.weight * grid.tsd, grid.meta, points, 0.0)
    tsd = jnp.where(wsum > 1e-6, wtsd / jnp.maximum(wsum, 1e-6), grid.truncation_distance)
    return tsd, wsum


# ---------------------------------------------------------------------------
# Prepared (pre-materialized) interpolators
# ---------------------------------------------------------------------------
#
# The patch matrices are loop-invariant across solver iterations, but XLA
# does not hoist their construction out of lax.scan bodies; rebuilding a
# ~30 MB matrix per LM iteration dominated the CT window solve. Preparing
# them ONCE per solve removes that traffic.


from typing import NamedTuple


class PreparedField3D(NamedTuple):
    """One 3D field ready for trilinear row-gather interpolation."""

    patches: jax.Array  # (nx*ny*nz + 1, 8)
    meta: GridMeta
    dims: jax.Array  # (3,) int32


def prepare_field_3d(values, meta: GridMeta, pad_value) -> PreparedField3D:
    return PreparedField3D(
        patches=_patch_matrix_3d(values, pad_value),
        meta=meta,
        dims=jnp.asarray(values.shape, jnp.int32),
    )


def interp_prepared_3d(field: PreparedField3D, points):
    nx, ny, nz = field.dims[0], field.dims[1], field.dims[2]
    u = (points - field.meta.min_corner) / field.meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = (wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]).reshape(
        points.shape[:-1] + (8,)
    )
    ok = (
        (i0[..., 0] >= 0) & (i0[..., 0] < nx)
        & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
        & (i0[..., 2] >= 0) & (i0[..., 2] < nz)
    )
    flat = jnp.where(ok, (i0[..., 0] * ny + i0[..., 1]) * nz + i0[..., 2], nx * ny * nz)
    rows = field.patches[flat].astype(jnp.float32)
    return jnp.sum(rows * w, axis=-1)


def gather_rows_3d(field: PreparedField3D, points):
    """One contiguous 8-tap row gather per point at world xyz positions
    (see gather_rows_2d — lets solvers carry rows across LM iterations)."""
    nx, ny, nz = field.dims[0], field.dims[1], field.dims[2]
    u = (points - field.meta.min_corner) / field.meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    ok = (
        (i0[..., 0] >= 0) & (i0[..., 0] < nx)
        & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
        & (i0[..., 2] >= 0) & (i0[..., 2] < nz)
    )
    flat = jnp.where(ok, (i0[..., 0] * ny + i0[..., 1]) * nz + i0[..., 2], nx * ny * nz)
    return field.patches[flat].astype(jnp.float32)


def trilinear_weights_and_derivs(points, meta: GridMeta):
    """(w8, dw8) of the trilinear taps at world positions: w8 (..., 8) and
    dw8 (..., 3, 8) = d w8 / d frac."""
    u = (points - meta.min_corner) / meta.resolution - 0.5
    frac = u - jnp.floor(u)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    one = jnp.ones_like(fx)
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    dw = jnp.stack([-one, one], axis=-1)
    def outer3(a, b, c):
        return (a[..., :, None, None] * b[..., None, :, None] * c[..., None, None, :]).reshape(
            points.shape[:-1] + (8,)
        )
    w8 = outer3(wx, wy, wz)
    dw8 = jnp.stack([outer3(dw, wy, wz), outer3(wx, dw, wz), outer3(wx, wy, dw)], axis=-2)
    return w8, dw8


class PreparedTsdf3D(NamedTuple):
    """Weight-aware TSDF interpolator with pre-built patch matrices."""

    w_field: PreparedField3D
    wtsd_field: PreparedField3D
    truncation_distance: jax.Array


class PreparedProb3D(NamedTuple):
    prob_field: PreparedField3D


def prepare_grid_3d(grid):
    """Prepare a TSDFGrid or ProbabilityGrid for repeated interpolation."""
    from hectorgrapher_tpu.mapping.grids import ensure_f32_grid

    grid = ensure_f32_grid(grid)  # finished submaps may be uint16-quantized
    if isinstance(grid, TSDFGrid):
        return PreparedTsdf3D(
            w_field=prepare_field_3d(grid.weight, grid.meta, 0.0),
            wtsd_field=prepare_field_3d(grid.weight * grid.tsd, grid.meta, 0.0),
            truncation_distance=grid.truncation_distance,
        )
    return PreparedProb3D(prob_field=prepare_field_3d(grid.probability(), grid.meta, 0.1))


def value_at_prepared_3d(prepared, points):
    """Match-cost field value: weight-gated TSD or (1 - probability)."""
    if isinstance(prepared, PreparedTsdf3D):
        wsum = interp_prepared_3d(prepared.w_field, points)
        wtsd = interp_prepared_3d(prepared.wtsd_field, points)
        tsd = jnp.where(wsum > 1e-6, wtsd / jnp.maximum(wsum, 1e-6), prepared.truncation_distance)
        return jnp.where(wsum > 1e-6, tsd, 0.0)
    return 1.0 - interp_prepared_3d(prepared.prob_field, points)


class PreparedField2D(NamedTuple):
    """One 2D field ready for bicubic row-gather interpolation."""

    patches: jax.Array  # (nx*ny + 1, 16)
    meta: GridMeta
    dims: jax.Array  # (2,) int32


def prepare_field_2d(values, meta: GridMeta, pad_value) -> PreparedField2D:
    return PreparedField2D(
        patches=_patch_matrix_2d(values, pad_value, _BICUBIC_TAPS_2D),
        meta=meta,
        dims=jnp.asarray(values.shape, jnp.int32),
    )


def prepare_field_2d_wide(
    values, meta: GridMeta, pad_value, slack: int, lanes: int | None = None
) -> PreparedField2D:
    """Bicubic patch matrix widened by `slack` cells per side: row c holds
    the (4+2*slack)^2 neighborhood at c + (-1-slack .. 2+slack)^2.

    Row gathers are row-count-bound on TPU, not byte-bound, so one wide
    row costs the same as a 16-tap row — but it serves EVERY bicubic
    lookup whose base cell lies within `slack` cells of c, which lets the
    GN solver gather once and run all LM iterations from carried rows."""
    nx, ny = values.shape
    w = 4 + 2 * slack
    lo = 1 + slack  # window starts at base cell - (1 + slack)
    hi = 2 + slack
    # Two-stage shifted stack (see correlative_2d._wide_patch_table): 2*w
    # slice kernels + one relayout; both w^2 separate slices and an im2col
    # conv are far slower. Channel order is (dx, dy) row-major.
    padded = jnp.pad(
        values.astype(jnp.float32), ((lo, hi), (lo, hi)), constant_values=pad_value
    )
    xs = jnp.stack([padded[dx : dx + nx, :] for dx in range(w)])  # (w, nx, ny+w)
    xy = jnp.stack([xs[:, :, dy : dy + ny] for dy in range(w)], axis=1)
    table = xy.transpose(2, 3, 0, 1).reshape(nx * ny, w * w)
    table = jnp.concatenate(
        [table, jnp.full((1, w * w), pad_value, jnp.float32)], axis=0
    )
    if lanes is not None and lanes > w * w:
        # Zero-filled spare lanes (e.g. up to the 128-lane VPU tile for the
        # pallas LM kernel); in-envelope kernel weights there are zero.
        table = jnp.pad(table, ((0, 0), (0, lanes - w * w)))
    return PreparedField2D(
        patches=table,
        meta=meta,
        dims=jnp.asarray(values.shape, jnp.int32),
    )


def interp_prepared_2d(field: PreparedField2D, points):
    nx, ny = field.dims[0], field.dims[1]
    u = (points - field.meta.min_corner) / field.meta.resolution - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    wx = _cubic_weights(frac[..., 0])
    wy = _cubic_weights(frac[..., 1])
    w = (wx[..., :, None] * wy[..., None, :]).reshape(points.shape[:-1] + (16,))
    ok = (i0[..., 0] >= 0) & (i0[..., 0] < nx) & (i0[..., 1] >= 0) & (i0[..., 1] < ny)
    flat = jnp.where(ok, i0[..., 0] * ny + i0[..., 1], nx * ny)
    rows = field.patches[flat].astype(jnp.float32)
    return jnp.sum(rows * w, axis=-1)


def prepare_probability_2d(grid: ProbabilityGrid) -> PreparedField2D:
    from hectorgrapher_tpu.mapping import probability_values as pv

    return prepare_field_2d(grid.probability(), grid.meta, pv.MIN_PROBABILITY)


class PreparedTsdf2D(NamedTuple):
    tsd_field: PreparedField2D
    weight_field: PreparedField2D


def prepare_tsdf_2d(grid: TSDFGrid) -> PreparedTsdf2D:
    return PreparedTsdf2D(
        tsd_field=prepare_field_2d(grid.tsd, grid.meta, grid.truncation_distance),
        weight_field=prepare_field_2d(grid.weight, grid.meta, 0.0),
    )
