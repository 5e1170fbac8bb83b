"""Real-time correlative scan matching in 2D as one dense kernel.

TPU-native replacement for RealTimeCorrelativeScanMatcher2D
(ref: internal/2d/scan_matching/real_time_correlative_scan_matcher_2d.cc,
correlative_scan_matcher_2d.cc SearchParameters). The reference loops over
candidates with early discretization; here the full (theta, dx, dy)
score volume is evaluated as one batched gather+reduction - the
"batch, don't queue" design from SURVEY.md section 7.

Score of a candidate = mean occupancy probability at the transformed hit
cells, down-weighted by exp(-(|t|*w_t + |theta|*w_r)^2) exactly as the
reference's candidate penalty.
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


class SearchWindow2D(NamedTuple):
    """Static search geometry (shapes must be known at trace time)."""

    num_angles: int
    angle_step: float
    num_linear: int  # cells per side: offsets in [-num_linear, num_linear]


def make_search_window(
    linear_search_window: float,
    angular_search_window: float,
    resolution: float,
    max_scan_range: float,
) -> SearchWindow2D:
    """(ref: correlative_scan_matcher_2d.cc SearchParameters ctor —
    angular step such that the farthest point moves at most one cell.)"""
    angle_step = math.acos(max(-1.0, min(1.0, 1.0 - resolution**2 / (2.0 * max(max_scan_range, resolution) ** 2))))
    num_angles = int(math.ceil(angular_search_window / angle_step))
    num_linear = int(math.ceil(linear_search_window / resolution))
    return SearchWindow2D(num_angles=num_angles, angle_step=angle_step, num_linear=num_linear)


@functools.partial(jax.jit, static_argnames=("window",))
def match_correlative_2d(
    grid: ProbabilityGrid,
    cloud: PointCloud,
    initial_pose: Rigid2,
    window: SearchWindow2D,
    translation_delta_cost_weight,
    rotation_delta_cost_weight,
) -> Tuple[jax.Array, Rigid2]:
    """Exhaustive dense search around initial_pose.

    cloud: points in tracking frame (xy used). Returns (score, pose).
    """
    prob = grid.probability()
    nx, ny = prob.shape
    res = grid.meta.resolution

    n_th = 2 * window.num_angles + 1
    thetas = (jnp.arange(n_th, dtype=jnp.float32) - window.num_angles) * window.angle_step
    angles = initial_pose.angle + thetas

    pts = cloud.positions[:, :2]
    valid = cloud.mask
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    # Rotate cloud for every angle candidate: (T, N, 2)
    rotated = rot2(angles[:, None], pts[None, :, :]) + initial_pose.translation[None, None, :]
    base_idx = cell_index(grid.meta, rotated)  # (T, N, 2)

    # TPU layout: instead of an element gather per (point, offset), build a
    # shifted-grid matrix Gshift (cells+1, D*D) once (cheap strided slices
    # of a padded grid) and fetch one CONTIGUOUS row per (angle, point) —
    # coalesced reads, then a dense reduction. Out-of-bounds points hit the
    # appended pad row (probability 0.1, matching unknown cells).
    k = window.num_linear
    d = 2 * k + 1
    # bf16 storage of the shifted-grid matrix halves gather bandwidth;
    # scores accumulate in f32 (ranking is insensitive to bf16 cell values).
    pad = jnp.pad(prob, k, constant_values=0.1).astype(jnp.bfloat16)
    shifts = [
        jax.lax.dynamic_slice(pad, (dx + k, dy + k), (nx, ny)).reshape(-1)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
    ]
    gshift = jnp.stack(shifts, axis=-1)  # (nx*ny, D*D)
    gshift = jnp.concatenate([gshift, jnp.full((1, d * d), 0.1, jnp.bfloat16)], axis=0)

    ok = (
        (base_idx[..., 0] >= 0)
        & (base_idx[..., 0] < nx)
        & (base_idx[..., 1] >= 0)
        & (base_idx[..., 1] < ny)
    )
    flat = jnp.where(ok, base_idx[..., 0] * ny + base_idx[..., 1], nx * ny)  # (T, N)
    rows = jnp.take(gshift, flat, axis=0).astype(jnp.float32)  # (T, N, D*D)
    rows = jnp.where(valid[None, :, None], rows, 0.0)
    scores = (jnp.sum(rows, axis=1) / n_valid).reshape(n_th, d, d)  # (T, Dx, Dy)

    # Candidate penalty (ref: real_time_correlative_scan_matcher_2d.cc:140-146).
    offs = jnp.arange(-k, k + 1, dtype=jnp.int32)
    dxy = offs.astype(jnp.float32) * res
    dist = jnp.sqrt(dxy[:, None] ** 2 + dxy[None, :] ** 2)  # (Dx, Dy)
    penalty = jnp.exp(
        -(
            (dist[None, :, :] * translation_delta_cost_weight
             + jnp.abs(thetas)[:, None, None] * rotation_delta_cost_weight)
            ** 2
        )
    )
    scores = scores * penalty

    best = jnp.argmax(scores)
    ti, xi, yi = jnp.unravel_index(best, scores.shape)
    best_pose = Rigid2(
        translation=initial_pose.translation + jnp.stack([dxy[xi], dxy[yi]]),
        angle=angles[ti],
    )
    return scores.reshape(-1)[best], best_pose
