"""Loop-closure scan matching in 2D: dense coarse-to-fine with top-k.

TPU-native replacement for FastCorrelativeScanMatcher2D
(ref: internal/2d/scan_matching/fast_correlative_scan_matcher_2d.{h,cc} —
PrecomputationGrid2D max-pool stack (:49) + depth-first branch-and-bound
(:112)). Same math, different schedule (SURVEY.md section 7 #3): the
max-pool pyramid provides the identical admissible upper bounds; instead
of data-dependent recursion we evaluate each depth densely for a fixed
top-k candidate set and expand the survivors. With k large relative to
the number of near-optimal basins this finds the same maximum, and every
step is a static-shape batched gather.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.grids import ProbabilityGrid, cell_index
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.rigid import Rigid2, rot2


def precompute_pyramid_2d(values, depth: int):
    """Max-pool stack: level d holds max over [x, x+2^d) x [y, y+2^d).

    (ref: PrecomputationGrid2D — same-resolution grids of running maxima
    with widths 1, 2, 4, ... 2^(depth-1).)
    Returns list of arrays, each the same shape as `values`.
    """
    out = [values]
    current = values
    for d in range(1, depth):
        w = 2 ** (d - 1)
        # max of current and current shifted by w in each axis (doubling trick)
        sx = jnp.concatenate([current[w:], jnp.full((w,) + current.shape[1:], -jnp.inf, current.dtype)], axis=0)
        m = jnp.maximum(current, sx)
        sy = jnp.concatenate([m[:, w:], jnp.full(m.shape[:1] + (w,), -jnp.inf, current.dtype)], axis=1)
        current = jnp.maximum(m, sy)
        out.append(current)
    return out


class FastSearchConfig(NamedTuple):
    num_angles: int  # candidates span [-num_angles, num_angles] * angle_step
    angle_step: float
    linear_cells: int  # offsets in [-linear_cells, linear_cells]
    depth: int
    top_k: int


def make_fast_search_config(
    linear_search_window: float,
    angular_search_window: float,
    resolution: float,
    max_scan_range: float,
    branch_and_bound_depth: int = 7,
    top_k: int = 256,
) -> FastSearchConfig:
    angle_step = math.acos(
        max(-1.0, min(1.0, 1.0 - resolution**2 / (2.0 * max(max_scan_range, resolution) ** 2)))
    )
    num_angles = int(math.ceil(angular_search_window / angle_step))
    linear_cells = int(math.ceil(linear_search_window / resolution))
    depth = max(1, min(branch_and_bound_depth, int(math.log2(max(2 * linear_cells, 2)))))
    return FastSearchConfig(num_angles, angle_step, linear_cells, depth, top_k)


class PreparedFastMatcher2D(NamedTuple):
    """Per-submap precomputation (the reference's SubmapScanMatcher /
    PrecomputationGridStack2D, constraint_builder_2d.cc
    DispatchScanMatcherConstruction): build ONCE per finished submap and
    reuse across every constraint candidate scored against it."""

    flat_levels: jax.Array  # (depth, nx*ny + 1) pyramid levels + OOB slot
    meta: object  # GridMeta
    dims: jax.Array  # (2,) int32


@functools.partial(jax.jit, static_argnames=("depth",))
def prepare_fast_matcher_2d(grid: ProbabilityGrid, depth: int) -> PreparedFastMatcher2D:
    from hectorgrapher_tpu.mapping.grids import ensure_f32_grid

    grid = ensure_f32_grid(grid)  # finished submaps may be uint16-quantized
    prob = grid.probability()
    pyramid = precompute_pyramid_2d(prob, depth)
    # Pad each level with a slot row for out-of-bounds (score 0.1).
    flat_levels = jnp.stack(
        [jnp.concatenate([p.reshape(-1), jnp.array([0.1], p.dtype)]) for p in pyramid]
    )
    return PreparedFastMatcher2D(
        flat_levels=flat_levels,
        meta=grid.meta,
        dims=jnp.asarray(prob.shape, jnp.int32),
    )


def match_fast_2d(
    grid: ProbabilityGrid,
    cloud: PointCloud,
    initial_pose: Rigid2,
    config: FastSearchConfig,
) -> Tuple[jax.Array, Rigid2]:
    """Search the window around initial_pose; returns (score, pose).

    Score is the mean occupancy probability at hit cells (same scale as
    the reference's CandidateScore; min_score gates apply outside).
    """
    return match_fast_2d_prepared(
        prepare_fast_matcher_2d(grid, config.depth), cloud, initial_pose, config
    )


@functools.partial(jax.jit, static_argnames=("config",))
def match_fast_2d_prepared(
    prepared: PreparedFastMatcher2D,
    cloud: PointCloud,
    initial_pose: Rigid2,
    config: FastSearchConfig,
) -> Tuple[jax.Array, Rigid2]:
    flat_levels = prepared.flat_levels
    nx, ny = prepared.dims[0], prepared.dims[1]
    res = prepared.meta.resolution

    n_th = 2 * config.num_angles + 1
    thetas = (jnp.arange(n_th, dtype=jnp.float32) - config.num_angles) * config.angle_step
    angles = initial_pose.angle + thetas

    pts = cloud.positions[:, :2]
    valid = cloud.mask
    n_valid = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)

    rotated = rot2(angles[:, None], pts[None, :, :]) + initial_pose.translation[None, None, :]
    base_idx = cell_index(prepared.meta, rotated)  # (T, N, 2)

    def score_candidates(level: int, cand_t, cand_ox, cand_oy):
        """Mean pooled probability for candidates (K,) at pyramid level.

        At levels > 0 negative block starts clamp to 0: level[0] pools
        [0, 2^level) which is a SUPERSET of the in-grid part of a block
        starting below 0, so the bound stays admissible (the reference
        extends the pooled grids by width-1 for the same reason,
        PrecomputationGrid2D offset_). Fully-outside blocks and level-0
        cells keep the exact 0.1 unknown score."""
        idx = base_idx[cand_t]  # (K, N, 2)
        ix = idx[..., 0] + cand_ox[:, None]
        iy = idx[..., 1] + cand_oy[:, None]
        if level > 0:
            span = 2 ** level
            inside = (ix > -span) & (ix < nx) & (iy > -span) & (iy < ny)
            ix = jnp.maximum(ix, 0)
            iy = jnp.maximum(iy, 0)
        else:
            inside = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        ok = inside & valid[None, :]
        flat = jnp.where(ok, ix * ny + iy, nx * ny)
        v = flat_levels[level][flat]
        v = jnp.where(valid[None, :], v, 0.0)
        return jnp.sum(v, axis=1) / n_valid

    k = config.top_k
    lc = config.linear_cells
    stride = 2 ** (config.depth - 1)

    # Initial candidates: all angles x coarse blocks.
    n_blocks = 2 * ((lc + stride - 1) // stride) + 1
    block_off = (jnp.arange(n_blocks) - n_blocks // 2) * stride - stride // 2
    tt, bx, by = jnp.meshgrid(jnp.arange(n_th), block_off, block_off, indexing="ij")
    cand_t = tt.reshape(-1)
    cand_ox = bx.reshape(-1)
    cand_oy = by.reshape(-1)
    scores = score_candidates(config.depth - 1, cand_t, cand_ox, cand_oy)

    def top(cands, scores, k):
        kk = min(k, scores.shape[0])
        s, i = jax.lax.top_k(scores, kk)
        return tuple(c[i] for c in cands), s

    (cand_t, cand_ox, cand_oy), scores = top((cand_t, cand_ox, cand_oy), scores, k)

    # Coarse-to-fine: expand each survivor into 4 children at half stride.
    for level in range(config.depth - 2, -1, -1):
        half = 2**level
        child_dx = jnp.array([0, 0, half, half], jnp.int32)
        child_dy = jnp.array([0, half, 0, half], jnp.int32)
        ct = jnp.repeat(cand_t, 4)
        cx = jnp.repeat(cand_ox, 4) + jnp.tile(child_dx, cand_ox.shape[0])
        cy = jnp.repeat(cand_oy, 4) + jnp.tile(child_dy, cand_oy.shape[0])
        # Clamp children to the search window.
        cx = jnp.clip(cx, -lc, lc)
        cy = jnp.clip(cy, -lc, lc)
        s = score_candidates(level, ct, cx, cy)
        (cand_t, cand_ox, cand_oy), scores = top((ct, cx, cy), s, k)

    best = jnp.argmax(scores)
    dx = cand_ox[best].astype(jnp.float32) * res
    dy = cand_oy[best].astype(jnp.float32) * res
    pose = Rigid2(
        translation=initial_pose.translation + jnp.stack([dx, dy]),
        angle=angles[cand_t[best]],
    )
    return scores[best], pose
