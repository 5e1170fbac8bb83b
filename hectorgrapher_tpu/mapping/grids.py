"""Dense grid map representations.

TPU-native replacement for the reference's grid structures:
  * Grid2D / ProbabilityGrid / TSDF2D (ref: mapping/2d/grid_2d.h,
    probability_grid.h, tsdf_2d.h)
  * HybridGrid / HybridGridTSDF sparse voxel trees (ref: mapping/3d/
    hybrid_grid.h, hybrid_grid_tsdf.h)

Design (SURVEY.md section 7, "Arrays, not trees"): submap grids are
fixed-extent dense arrays. The reference already bounds submaps spatially
and retires them after 2*num_range_data scans, so a dense array per submap
is affordable and turns every grid op into a vectorized tensor op. The
uint16 quantization of the reference is a memory optimization we can add
later (int16 storage + f32 compute); numerics here are float32.

Conventions (deliberately simpler than the reference's inverted
MapLimits axes):
  * A grid covers the cube centered at the submap-local origin.
  * cell_index i = floor((p - min_corner) / resolution), per axis.
  * cell_center = min_corner + (i + 0.5) * resolution.
  * 2D arrays are indexed [ix, iy]; 3D arrays [ix, iy, iz].

Occupancy is stored as log-odds + known mask (see probability_values.py);
TSDF as (tsd, weight) pairs where weight == 0 marks unknown cells
(matching hybrid_grid_tsdf.h where default weight is 0).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping import probability_values as pv


class GridMeta(NamedTuple):
    """Static geometry of a dense grid. Kept as a separate aux pytree leaf
    set so jitted functions treat resolution/size as traced scalars."""

    resolution: jax.Array  # scalar f32
    min_corner: jax.Array  # (2,) or (3,) f32: position of cell (0,0[,0]) corner


def make_meta(resolution: float, size_cells: Tuple[int, ...], center=None) -> GridMeta:
    dims = len(size_cells)
    half = jnp.asarray([s * resolution / 2.0 for s in size_cells], dtype=jnp.float32)
    c = jnp.zeros((dims,), jnp.float32) if center is None else jnp.asarray(center, jnp.float32)
    return GridMeta(resolution=jnp.asarray(resolution, jnp.float32), min_corner=c - half)


def cell_index(meta: GridMeta, points):
    """Float position (..., D) -> integer cell index (..., D).

    Always computed in float32 so host (x64) and device (f32) callers
    agree on boundary cells.
    """
    p = jnp.asarray(points, jnp.float32)
    return jnp.floor((p - meta.min_corner) / meta.resolution).astype(jnp.int32)


def cell_center(meta: GridMeta, indices):
    return meta.min_corner + (indices.astype(jnp.float32) + 0.5) * meta.resolution


def in_bounds(indices, shape) -> jax.Array:
    ok = jnp.ones(indices.shape[:-1], dtype=bool)
    for d, s in enumerate(shape):
        ok &= (indices[..., d] >= 0) & (indices[..., d] < s)
    return ok


def flat_index(indices, shape):
    """Row-major linear index; out-of-bounds mapped to size (drop slot)."""
    ok = in_bounds(indices, shape)
    flat = jnp.zeros(indices.shape[:-1], dtype=jnp.int32)
    for d, s in enumerate(shape):
        flat = flat * s + jnp.clip(indices[..., d], 0, s - 1)
    size = 1
    for s in shape:
        size *= s
    return jnp.where(ok, flat, size)


# ---------------------------------------------------------------------------
# Occupancy grids (2D and 3D share the representation)
# ---------------------------------------------------------------------------


class ProbabilityGrid(NamedTuple):
    """Occupancy grid: log-odds + known mask.

    (ref: mapping/2d/probability_grid.h and mapping/3d/hybrid_grid.h —
    both become this, with ndim 2 or 3.)
    """

    log_odds: jax.Array  # (nx, ny[, nz]) f32
    known: jax.Array  # same shape, bool
    meta: GridMeta

    @property
    def shape(self):
        return self.log_odds.shape

    def probability(self):
        """Occupancy probability; unknown cells read MIN_PROBABILITY
        (ref: probability_values.h kUnknownProbabilityValue semantics in
        scan matching: unknown -> kMinProbability)."""
        p = pv.probability_from_log_odds(self.log_odds)
        return jnp.where(self.known, pv.clamp_probability(p), pv.MIN_PROBABILITY)


def make_probability_grid(resolution: float, size_cells: Tuple[int, ...], center=None) -> ProbabilityGrid:
    return ProbabilityGrid(
        log_odds=jnp.zeros(size_cells, jnp.float32),
        known=jnp.zeros(size_cells, bool),
        meta=make_meta(resolution, size_cells, center),
    )


# ---------------------------------------------------------------------------
# TSDF grids
# ---------------------------------------------------------------------------


class TSDFGrid(NamedTuple):
    """Truncated signed distance grid with per-cell weights.

    (ref: mapping/2d/tsdf_2d.h, mapping/3d/hybrid_grid_tsdf.h). weight == 0
    means unknown; tsd of unknown cells reads as +truncation_distance
    outside. truncation_distance is carried for interpolation/matching.
    """

    tsd: jax.Array  # (nx, ny[, nz]) f32
    weight: jax.Array  # same shape f32
    truncation_distance: jax.Array  # scalar f32
    max_weight: jax.Array  # scalar f32
    meta: GridMeta

    @property
    def shape(self):
        return self.tsd.shape


STORAGE_DTYPES = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}


def make_tsdf_grid(
    resolution: float,
    size_cells: Tuple[int, ...],
    truncation_distance: float,
    max_weight: float,
    center=None,
    dtype=jnp.float32,
) -> TSDFGrid:
    """dtype: storage precision of the dense arrays. The reference packs
    cells into uint16 via TSDValueConverter (hybrid_grid_tsdf.h); here the
    memory/bandwidth option is float16/bfloat16 storage with float32
    compute (kernels upcast after gathering)."""
    return TSDFGrid(
        tsd=jnp.full(size_cells, truncation_distance, dtype),
        weight=jnp.zeros(size_cells, dtype),
        truncation_distance=jnp.asarray(truncation_distance, jnp.float32),
        max_weight=jnp.asarray(max_weight, jnp.float32),
        meta=make_meta(resolution, size_cells, center),
    )
