"""Loop-closure scan matching in 3D: dense coarse-to-fine with top-k.

TPU-native replacement for FastCorrelativeScanMatcher3D
(ref: internal/3d/scan_matching/fast_correlative_scan_matcher_3d.{h,cc} —
PrecomputationGrid3D 8-bit max-pool pyramid (precomputation_grid_3d.h:37),
yaw candidates gated by RotationalScanMatcher histogram scores (:276-327),
lowest-resolution exhaustive (x,y,z) scoring (:330-400), branch-and-bound
refinement (:410-475), final low_resolution_matcher gate
(low_resolution_matcher.cc); Match (:158) and MatchFullSubmap (:177)).

Design: same admissible max-pool bounds, but each depth is a dense
batched gather over a fixed top-k candidate set (SURVEY.md section 7 #3).
Grids are scored as "hit likelihood" in [0.1, 0.9]: occupancy probability
for PROBABILITY_GRID submaps, 0.9*(1 - |tsd|/truncation) clamped to >=0.1
(weight-gated) for TSDF submaps, so min_score thresholds carry over.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid, TSDFGrid, cell_index
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import (
    compute_histogram,
    match_histograms,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.rigid import Rigid3, quat_from_yaw, quat_multiply, quat_rotate


def grid_match_scores(grid) -> jax.Array:
    """Hit-likelihood field in [0.1, 0.9] for matching."""
    from hectorgrapher_tpu.mapping.grids import ensure_f32_grid

    grid = ensure_f32_grid(grid)  # finished submaps may be uint16-quantized
    if isinstance(grid, ProbabilityGrid):
        return grid.probability()
    tsd = grid.tsd
    w = grid.weight
    s = 0.9 * (1.0 - jnp.abs(tsd) / grid.truncation_distance)
    return jnp.where(w > 1e-6, jnp.clip(s, 0.1, 0.9), 0.1)


_Y_MIN_LANES = 64  # lane floor: gathers of narrower rows waste the
# TPU's ~512 B memory transactions (measured round 5: 8-lane coarse rows
# made the production fm launch gather-transaction-bound)


def _y_shift(ny: int, level: int) -> int:
    """y-axis decimation exponent at `level`: halve only while the lane
    count stays >= _Y_MIN_LANES (x/z always halve)."""
    m, cur = 0, ny
    while m < level and -(-cur // 2) >= _Y_MIN_LANES:
        cur = -(-cur // 2)
        m += 1
    return m


def precompute_pyramid_3d(values, depth: int):
    """DECIMATED admissible max pyramid (list of per-level fields).

    Level 0 is the exact score field. Level l >= 1 stores cells at stride
    2^l in x/z and 2^m in y (m = _y_shift: y stops halving at the
    _Y_MIN_LANES lane floor so row gathers keep full memory
    transactions), each holding the max over a window that covers
    [q, q + 2^l) on every axis for ANY query q landing in the cell —
    x/z: the double-width aligned window [2^l X, 2^l X + 2^(l+1));
    y: the (2^(l-m) + 1)-cell aligned window. The value at
    (floor(qx/2^l), floor(qy/2^m), floor(qz/2^l)) therefore upper-bounds
    every exact score in [q, q + 2^l)^3 — the branch-and-bound invariant
    — while total storage is ~1.2x the base field instead of depth x.
    (The reference's PrecomputationGrid3D stack,
    precomputation_grid_3d.h:37, keeps every level at full resolution —
    affordable in robot RAM, but at the production 256^3 extent a
    full-res 8-level bf16 stack is ~268 MB/submap of HBM vs ~40 MB
    decimated.) Out-of-grid window parts contribute the floor score 0.1,
    matching the dense edge semantics."""
    out = [values]
    ny = values.shape[1]

    def pool2(m, axis):
        # Stride-2 aligned max-reduce; odd extents pad with the floor.
        n = m.shape[axis]
        if n % 2:
            pad_shape = list(m.shape)
            pad_shape[axis] = 1
            m = jnp.concatenate(
                [m, jnp.full(pad_shape, 0.1, m.dtype)], axis=axis
            )
        a = jax.lax.slice_in_dim(m, 0, m.shape[axis], 2, axis=axis)
        b = jax.lax.slice_in_dim(m, 1, m.shape[axis], 2, axis=axis)
        return jnp.maximum(a, b)

    def widen(m, axis, window: int):
        # Running max over `window` adjacent cells (aligned, high edge
        # pads floor): doubling shift-maxes, then one final shift.
        def shifted_by(x, s):
            s = min(s, x.shape[axis])
            pad_shape = list(x.shape)
            pad_shape[axis] = s
            return jnp.concatenate(
                [
                    jax.lax.slice_in_dim(x, s, x.shape[axis], axis=axis),
                    jnp.full(pad_shape, 0.1, x.dtype),
                ],
                axis=axis,
            )

        cov = 1  # cells covered so far
        cur = m
        while cov < window:
            s = min(cov, window - cov)
            cur = jnp.maximum(cur, shifted_by(cur, s))
            cov += s
        return cur

    aligned = values
    prev_my = 0
    for level in range(1, depth):
        my = _y_shift(ny, level)
        aligned = pool2(aligned, 0)
        aligned = pool2(aligned, 2)
        if my > prev_my:
            aligned = pool2(aligned, 1)
            prev_my = my
        m = widen(aligned, 0, 2)
        m = widen(m, 2, 2)
        m = widen(m, 1, (1 << (level - my)) + 1)
        out.append(m)
    return out


def _level_cells(n: int, level: int) -> int:
    """Cells per axis of a decimated level: ceil(n / 2^level)."""
    return -(-n // (1 << level))


def _fc2_on_tpu() -> bool:
    from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import _on_tpu

    return _on_tpu()


def _level_flat_table(pl, dtype, paired: bool):
    """One decimated level field (nx_l, ny_l, nz_l) -> its flat row table:
    value-0.1 y-minor rows in (z, x) order plus one zero OOB row.
    paired=True (TPU): each row carries cells (x, x+1) as 2*ny_l lanes
    (x+1 beyond the grid contributes 0)."""
    r = jnp.transpose(pl - 0.1, (2, 0, 1))  # (nz_l, nx_l, ny_l)
    if paired:
        r_next = jnp.concatenate(
            [r[:, 1:], jnp.zeros_like(r[:, :1])], axis=1
        )
        r = jnp.concatenate([r, r_next], axis=2)  # (nz_l, nx_l, 2*ny_l)
    rows = r.reshape(-1, r.shape[-1])
    return jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[-1]), rows.dtype)]
    ).astype(dtype)


class FastSearch3DConfig(NamedTuple):
    linear_xy_cells: int
    linear_z_cells: int
    depth: int
    top_k: int
    num_yaw: int  # yaw candidates span [-num_yaw, num_yaw] * yaw_step
    yaw_step: float
    min_rotational_score: float
    min_low_resolution_score: float


def make_fast_search_3d_config(
    options,
    resolution: float,
    max_scan_range: float,
    full_submap: bool = False,
    top_k: int = 2048,
    grid_cells: int = 0,
) -> FastSearch3DConfig:
    """options: FastCorrelativeScanMatcherOptions3D. For full-submap
    (global localization) searches pass grid_cells — the linear window is
    sized to cover the whole submap (ref: MatchFullSubmap widens the
    linear window, not only yaw)."""
    yaw_step = math.acos(
        max(-1.0, min(1.0, 1.0 - resolution**2 / (2.0 * max(max_scan_range, resolution) ** 2)))
    )
    # Reference uses coarser angular sampling in 3D tied to resolution at
    # max range; cap the candidate count for tractability.
    yaw_window = math.pi if full_submap else options.angular_search_window
    num_yaw = int(math.ceil(yaw_window / yaw_step))
    max_yaw_candidates = 128
    if num_yaw > max_yaw_candidates:
        yaw_step = yaw_window / max_yaw_candidates
        num_yaw = max_yaw_candidates
    xy_cells = int(math.ceil(options.linear_xy_search_window / resolution))
    z_cells = int(math.ceil(options.linear_z_search_window / resolution))
    if full_submap and grid_cells > 0:
        xy_cells = max(xy_cells, grid_cells // 2)
        z_cells = max(z_cells, grid_cells // 4)
    depth = max(1, min(options.branch_and_bound_depth, int(math.log2(max(2 * xy_cells, 2)))))
    return FastSearch3DConfig(
        linear_xy_cells=xy_cells,
        linear_z_cells=z_cells,
        depth=depth,
        top_k=top_k,
        num_yaw=num_yaw,
        yaw_step=yaw_step,
        min_rotational_score=options.min_rotational_score,
        min_low_resolution_score=options.min_low_resolution_score,
    )


@functools.partial(jax.jit, static_argnames=("config", "grid_shape"))
def match_fast_3d(
    pyramid_levels,  # tuple of per-level (rows_l + 1, ny_l) flat tables
    grid_shape_meta: GridMeta,
    grid_shape: Tuple[int, int, int],
    low_scores,  # (lx, ly, lz) low-res score field
    low_meta: GridMeta,
    high_cloud: PointCloud,
    low_cloud: PointCloud,
    initial_pose: Rigid3,
    yaw_scores,  # (2*num_yaw+1,) rotational-histogram scores per candidate
    config: FastSearch3DConfig,
):
    zero = jnp.asarray(0, jnp.int32)
    return _match_fast_3d_core(
        tuple(pyramid_levels),
        (zero,) * len(pyramid_levels),
        grid_shape_meta,
        grid_shape,
        low_scores,
        low_meta,
        high_cloud,
        low_cloud,
        initial_pose,
        yaw_scores,
        config,
    )


def _match_fast_3d_core(
    tables,  # tuple per level: (R_l, ny_l) stacked (submap, z, x) y-rows, value-0.1
    row_bases,  # tuple per level: int32 scalar start row of this candidate's submap block
    grid_shape_meta: GridMeta,
    grid_shape: Tuple[int, int, int],
    low_scores,  # (lx, ly, lz) low-res score field
    low_meta: GridMeta,
    high_cloud: PointCloud,
    low_cloud: PointCloud,
    initial_pose: Rigid3,
    yaw_scores,  # (2*num_yaw+1,) rotational-histogram scores per candidate
    config: FastSearch3DConfig,
):
    """Core search. Returns (score, low_res_score, rotational_score, pose).

    initial_pose maps the scan's tracking frame into the grid (local)
    frame. Yaw candidates rotate about the z axis of the local frame.

    Same schedule as the 2D matcher (fast_correlative_2d.
    _match_fast_2d_core): each DECIMATED pyramid level stores
    (bound - 0.1) as y-minor rows in a (z_l, x_l) row grid with one zero
    OOB row, addressed through a per-level shared flat table (row_bases
    fold the submap in — a per-candidate operand under vmap
    batch-serializes the gather). Full-resolution cell indices decimate
    by 2^level at lookup (floor shift); the double-width construction
    window keeps the bound admissible for any query (see
    precompute_pyramid_3d). Each gathered y-row serves EVERY y-offset of
    the coarse stage and both y-children of an expansion, picked by a
    virtual one-hot that fuses into the reduce; scoring is
    0.1 + sum(contributions)/n_valid with out-of-bounds contributing
    exactly 0. The low-edge clamp semantics (span = 2^level; negative
    starts read index 0) match the reference's PrecomputationGrid3D
    admissible bound."""
    from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
        _on_tpu,
        _point_chunk,
    )

    nx, ny, nz = grid_shape
    # A search may request more levels than the submap's stack holds
    # (full-submap windows exceed the construction-time depth when the
    # branch-and-bound depth outruns the grid extent); clamp — a smaller
    # coarse stride only makes the coarse stage denser, still admissible.
    depth = min(config.depth, len(tables))
    res = grid_shape_meta.resolution

    n_yaw = 2 * config.num_yaw + 1
    yaws = (jnp.arange(n_yaw, dtype=jnp.float32) - config.num_yaw) * config.yaw_step
    yaw_ok = yaw_scores >= config.min_rotational_score

    pts = high_cloud.positions
    valid = high_cloud.mask
    n_valid = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)

    # Rotate cloud: world = R_yaw * (R0 p + t0 - t0) + t0  (yaw about the
    # initial pose's position, matching the reference's discrete scans
    # generated per yaw around the initial estimate).
    base = quat_rotate(initial_pose.rotation[None, :], pts) + initial_pose.translation[None, :]
    rel = base - initial_pose.translation[None, :]
    yaw_q = quat_from_yaw(yaws)  # (T, 4)
    rot = quat_rotate(yaw_q[:, None, :], rel[None, :, :]) + initial_pose.translation[None, None, :]
    base_idx = cell_index(grid_shape_meta, rot)  # (T, N, 3)

    CH = _point_chunk()
    n_pts = pts.shape[0]
    pad = (-n_pts) % CH
    nch = (n_pts + pad) // CH

    def pad_pts(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full(a.shape[:-1] + (pad,), fill, a.dtype)], axis=-1
            )
        return a

    bx = pad_pts(base_idx[..., 0], nx + 1)  # (T, P); pads land OOB
    by = pad_pts(base_idx[..., 1], ny + 1)
    bz = pad_pts(base_idx[..., 2], nz + 1)
    validp = pad_pts(valid, False)
    on_tpu = _on_tpu()

    def score_sum(level, ix, iy, iz, bvalid):
        """Summed (bound - 0.1) contributions from the DECIMATED level.

        ix: (..., P, X); iy: (..., P, Y); iz: (..., P, Z): full-resolution
        cell indices (point cell + candidate offset); bvalid: (P,).
        Returns (..., X, Y, Z), chunked over P."""
        flat_table = tables[level]
        base_row = row_bases[level]
        span = 2 ** level
        my = _y_shift(ny, level)
        y_span = 1 << my
        nx_l = _level_cells(nx, level)
        ny_l = _level_cells(ny, my)
        nz_l = _level_cells(nz, level)

        def body(acc, args):
            ixc, iyc, izc, bvc = args  # (..., CH, X/Y/Z), (CH,)
            x_in = (ixc > -span) & (ixc < nx)
            ixg = jnp.maximum(ixc, 0) // span
            z_in = (izc > -span) & (izc < nz)
            izg = jnp.maximum(izc, 0) // span
            # One row per (point, x, z): OOB on either axis routes to the
            # level's zero row.
            rowidx = jnp.where(
                x_in[..., :, None] & z_in[..., None, :],
                izg[..., None, :] * nx_l + ixg[..., :, None],
                nz_l * nx_l,
            )  # (..., CH, X, Z)
            y_in = (iyc > -span) & (iyc < ny)
            iyg = jnp.where(
                y_in & bvc[:, None], jnp.clip(iyc, 0, ny - 1) // y_span, -1
            )
            if on_tpu:
                # X-PAIRED rows (see _level_flat_table): both callers pass
                # x offsets that are CONSECUTIVE level cells in (even, odd)
                # pairs — the coarse stage's stride-step offsets and the
                # expansion's {o, o+2^level} children — so ONE gather of
                # the (x, x+1) pair row serves both. Halves the row-gather
                # count the kernel is bound by.
                xn = ixc.shape[-1]
                p2 = (xn + 1) // 2
                if 2 * p2 != xn:  # pad odd X with a duplicate (sliced off)
                    ix_p = jnp.concatenate([ixc, ixc[..., -1:]], axis=-1)
                    x_in_p = jnp.concatenate(
                        [x_in, jnp.zeros_like(x_in[..., -1:])], axis=-1
                    )
                else:
                    ix_p, x_in_p = ixc, x_in
                cells = jnp.maximum(ix_p, 0) // span  # (..., CH, Xp)
                base_c = cells[..., 0::2]  # (..., CH, P2)
                sel = jnp.clip(
                    cells - jnp.repeat(base_c, 2, axis=-1), 0, 1
                )  # (..., CH, Xp) in {0, 1}: which half of the pair row
                pair_in = x_in_p[..., 0::2] | x_in_p[..., 1::2]
                rowidx2 = jnp.where(
                    pair_in[..., :, None] & z_in[..., None, :],
                    izg[..., None, :] * nx_l + base_c[..., :, None],
                    nz_l * nx_l,
                )  # (..., CH, P2, Z)
                rows = flat_table[base_row + rowidx2]  # (..., CH, P2, Z, 2*ny_l)
                rows2 = rows.reshape(rows.shape[:-1] + (2, ny_l))
                # Cheap 2-way half select -> per-child rows.
                xs = sel.reshape(sel.shape[:-1] + (p2, 2))
                xeq = xs[..., None] == jnp.arange(2, dtype=sel.dtype)
                prod_h = jnp.where(
                    xeq[..., :, :, None, :, None],  # (..., CH, P2, 2c, 1, 2h, 1)
                    rows2[..., :, None, :, :, :],  # (..., CH, P2, 1, Z, 2h, ny)
                    flat_table.dtype.type(0),
                )
                rows_child = jnp.sum(prod_h, axis=-2)  # (..., CH, P2, 2c, Z, ny)
                rows_child = rows_child.reshape(
                    rows_child.shape[:-4] + (2 * p2,) + rows_child.shape[-2:]
                )[..., :xn, :, :]  # (..., CH, X, Z, ny)
                # A child may be x-OOB while its pair row is valid.
                rows_child = jnp.where(
                    x_in[..., :, None, None], rows_child, flat_table.dtype.type(0)
                )
                lanes = jnp.arange(ny_l, dtype=iyg.dtype)
                eq = iyg[..., None] == lanes  # (..., CH, Y, ny_l) — virtual
                prod = jnp.where(
                    eq[..., None, None, :, :],
                    rows_child[..., :, :, None, :],
                    flat_table.dtype.type(0),
                )  # (..., CH, X, Z, Y, ny_l) — virtual
                c = jnp.sum(prod, axis=(-1, -5), dtype=jnp.float32)  # (..., X, Z, Y)
            else:
                # CPU: plain scalar picks (see the 2D core).
                flat1d = flat_table.reshape(-1)
                pick = iyg >= 0  # (..., CH, Y)
                idx = (
                    (base_row + rowidx)[..., :, None, :] * ny_l
                    + jnp.maximum(iyg, 0)[..., None, :, None]
                )  # (..., CH, X, Y, Z)
                v = flat1d[idx].astype(jnp.float32)
                v = jnp.where(pick[..., None, :, None], v, 0.0)
                c = jnp.moveaxis(jnp.sum(v, axis=-4), -2, -1)  # (..., X, Z, Y)
            return acc + c, None

        chunk = lambda a: jnp.moveaxis(
            a.reshape(a.shape[:-2] + (nch, CH, a.shape[-1])), -3, 0
        )
        init = jnp.zeros(
            ix.shape[:-2] + (ix.shape[-1], iz.shape[-1], iy.shape[-1]), jnp.float32
        )
        acc, _ = jax.lax.scan(
            body, init, (chunk(ix), chunk(iy), chunk(iz), validp.reshape(nch, CH))
        )
        return jnp.moveaxis(acc, -1, -2)  # (..., X, Y, Z)

    k = config.top_k
    lxy = config.linear_xy_cells
    lz = config.linear_z_cells
    stride = 2 ** (depth - 1)

    nbx = 2 * ((lxy + stride - 1) // stride) + 1
    nbz = 2 * ((lz + stride - 1) // stride) + 1
    off_xy = (jnp.arange(nbx, dtype=jnp.int32) - nbx // 2) * stride - stride // 2
    off_z = (jnp.arange(nbz, dtype=jnp.int32) - nbz // 2) * stride - stride // 2
    ix0 = bx[:, :, None] + off_xy[None, None, :]  # (T, P, JX)
    iy0 = by[:, :, None] + off_xy[None, None, :]
    iz0 = bz[:, :, None] + off_z[None, None, :]
    s0 = score_sum(depth - 1, ix0, iy0, iz0, validp)  # (T, JX, JY, JZ)
    s0 = 0.1 + s0 / n_valid
    s0 = jnp.where(yaw_ok[:, None, None, None], s0, -1.0)
    tt, bxg, byg, bzg = jnp.meshgrid(
        jnp.arange(n_yaw, dtype=jnp.int32), off_xy, off_xy, off_z, indexing="ij"
    )
    cand = (tt.reshape(-1), bxg.reshape(-1), byg.reshape(-1), bzg.reshape(-1))
    scores = s0.reshape(-1)

    def top(cands, scores, k):
        kk = min(k, scores.shape[0])
        s, i = jax.lax.top_k(scores, kk)
        return tuple(c[i] for c in cands), s

    cand, scores = top(cand, scores, k)

    for level in range(depth - 2, -1, -1):
        half = 2 ** level
        dxy = jnp.array([0, half], jnp.int32)
        ct, cox, coy, coz = cand
        cxs = jnp.clip(cox[:, None] + dxy, -lxy, lxy)  # (K, 2)
        cys = jnp.clip(coy[:, None] + dxy, -lxy, lxy)
        czs = jnp.clip(coz[:, None] + dxy, -lz, lz)
        bxk = bx[ct]  # (K, P)
        byk = by[ct]
        bzk = bz[ct]
        s = score_sum(
            level,
            bxk[:, :, None] + cxs[:, None, :],
            byk[:, :, None] + cys[:, None, :],
            bzk[:, :, None] + czs[:, None, :],
            validp,
        )  # (K, 2, 2, 2) in (x, y, z) child order
        kk = ct.shape[0]
        s = 0.1 + s / n_valid
        s = jnp.where(yaw_ok[ct][:, None, None, None], s, -1.0)
        ctf = jnp.repeat(ct, 8)
        cxf = jnp.broadcast_to(cxs[:, :, None, None], (kk, 2, 2, 2)).reshape(-1)
        cyf = jnp.broadcast_to(cys[:, None, :, None], (kk, 2, 2, 2)).reshape(-1)
        czf = jnp.broadcast_to(czs[:, None, None, :], (kk, 2, 2, 2)).reshape(-1)
        cand, scores = top((ctf, cxf, cyf, czf), s.reshape(-1), k)

    best = jnp.argmax(scores)
    t_best, ox, oy, oz = (c[best] for c in cand)
    offset = jnp.stack([ox, oy, oz]).astype(jnp.float32) * res
    best_yaw_q = quat_from_yaw(yaws[t_best])
    pose = Rigid3(
        translation=initial_pose.translation + offset,
        rotation=quat_multiply(best_yaw_q, initial_pose.rotation),
    )

    # Final low-resolution gate (ref: low_resolution_matcher.cc — mean
    # low-res score of the low-res cloud at the candidate pose).
    low_pts = quat_rotate(pose.rotation[None, :], low_cloud.positions) + pose.translation[None, :]
    li = cell_index(low_meta, low_pts)
    lxs, lys, lzs = low_scores.shape
    lok = (
        (li[..., 0] >= 0) & (li[..., 0] < lxs)
        & (li[..., 1] >= 0) & (li[..., 1] < lys)
        & (li[..., 2] >= 0) & (li[..., 2] < lzs)
        & low_cloud.mask
    )
    lflat = jnp.where(lok, (li[..., 0] * lys + li[..., 1]) * lzs + li[..., 2], lxs * lys * lzs)
    low_flat = jnp.concatenate([low_scores.reshape(-1), jnp.array([0.1], low_scores.dtype)])
    lv = jnp.where(low_cloud.mask, low_flat[lflat], 0.0)
    low_score = jnp.sum(lv) / jnp.maximum(jnp.sum(low_cloud.mask), 1)

    return scores[best], low_score, yaw_scores[t_best], pose


class FastCorrelativeScanMatcher3D:
    """Host wrapper: builds pyramids once per submap, runs jitted search.

    (ref: fast_correlative_scan_matcher_3d.h FastCorrelativeScanMatcher3D —
    constructed per submap by the constraint builder.)
    """

    def __init__(self, options, high_grid, low_grid, submap_histogram, histogram_size=120):
        self._options = options
        # Grids are KEPT in their storage form (uint16-quantized for
        # finished submaps) — the pyramid/low-score derivations dequantize
        # transiently (grid_match_scores), and the pose graph's GN packs
        # stack the compact form, dequantizing on-device after the row
        # gather (VERDICT r4 weak #1: f32 packs doubled the footprint the
        # uint16 option was built to halve).
        self._high_grid = high_grid
        self._low_grid = low_grid
        self._histogram = jnp.asarray(submap_histogram)
        self._histogram_size = histogram_size
        scores = grid_match_scores(high_grid)
        # Build the stack at the FULL branch-and-bound depth (clamped only
        # by the grid extent) — full-submap searches (MatchFullSubmap)
        # need deeper levels than the local window implies; the reference
        # builds PrecomputationGridStack3D at options depth unclamped.
        depth = int(options.branch_and_bound_depth)
        depth = max(1, min(depth, int(math.log2(max(min(scores.shape), 2)))))
        pyr = precompute_pyramid_3d(scores, depth)
        # Row-gather layout (see _match_fast_3d_core): per level a
        # (nz*nx, ny) grid of y-minor rows storing score-0.1, plus one
        # zero OOB row; bf16 on TPU (f32 on the CPU test backend).
        from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
            _level_dtype,
        )

        dt = _level_dtype()
        # Per-level flat tables (decimated levels have different shapes).
        # TPU: X-PAIRED rows — row (z, x) carries the y-rows of cells x
        # AND x+1 (2*ny_l lanes, overlapping, 2x memory), so ONE gather
        # serves both x-children of an expansion / both members of a
        # consecutive coarse x pair; the kernel is row-gather-COUNT bound
        # (measured round 5, BASELINE.md headroom note), so halving row
        # count buys more than the doubled lane width costs.
        self._pyramid_levels = tuple(
            _level_flat_table(pl, dt, paired=_fc2_on_tpu()) for pl in pyr
        )
        self._low_scores = grid_match_scores(low_grid)

    def to_host(self):
        """Demote derived search state to host numpy. Called by the pose
        graph's pack cache once the packed (sharded) copy is the device
        residence — otherwise every finished submap's pyramid would live
        in HBM twice. The serial match path transparently re-uploads on
        use (jit arguments accept numpy)."""
        self._pyramid_levels = tuple(np.asarray(t) for t in self._pyramid_levels)
        self._low_scores = np.asarray(self._low_scores)
        self._histogram = np.asarray(self._histogram)

    def _run(self, high_cloud, low_cloud, initial_pose, config, scan_histogram, initial_yaw):
        n_yaw = 2 * config.num_yaw + 1
        yaws = (np.arange(n_yaw) - config.num_yaw) * config.yaw_step
        # Rotating the scan by yaw rotates its histogram: compare the
        # submap histogram against the scan histogram rotated by each
        # candidate (+ the initial yaw of the scan in the local frame).
        yaw_scores = match_histograms(
            self._histogram, scan_histogram, jnp.asarray(yaws + initial_yaw)
        )
        if not bool(self._options.use_rotational_scan_matcher):
            yaw_scores = jnp.ones_like(yaw_scores)
        else:
            # Beam-search adaptation: besides the reference's threshold
            # gate, restrict to the best-scoring yaw candidates so the
            # fixed top-k beam concentrates on plausible rotations
            # (coarse max-pool levels plateau and cannot rank yaws).
            max_yaws = 16
            if yaw_scores.shape[0] > max_yaws:
                kth = jnp.sort(yaw_scores)[-max_yaws]
                yaw_scores = jnp.where(yaw_scores >= kth, yaw_scores, -1.0)
        score, low_score, rot_score, pose = match_fast_3d(
            self._pyramid_levels,
            self._high_grid.meta,
            self._high_grid.shape
            if isinstance(self._high_grid, ProbabilityGrid)
            else self._high_grid.tsd.shape,
            self._low_scores,
            self._low_grid.meta,
            high_cloud,
            low_cloud,
            initial_pose,
            yaw_scores,
            config,
        )
        return score, low_score, rot_score, pose

    def match(self, initial_pose: Rigid3, high_cloud, low_cloud, scan_histogram, initial_yaw, max_scan_range=20.0, top_k=256):
        """(ref: Match :158 — local window search)"""
        config = make_fast_search_3d_config(
            self._options, float(self._high_grid.meta.resolution), max_scan_range, False, top_k
        )
        return self._run(high_cloud, low_cloud, initial_pose, config, scan_histogram, initial_yaw)

    def match_full_submap(self, initial_pose: Rigid3, high_cloud, low_cloud, scan_histogram, initial_yaw, max_scan_range=20.0, top_k=256):
        """(ref: MatchFullSubmap :177 — full yaw range, window sized to
        cover the submap)"""
        config = make_fast_search_3d_config(
            self._options, float(self._high_grid.meta.resolution), max_scan_range, True, top_k,
            grid_cells=int(self._high_grid.tsd.shape[0]) if hasattr(self._high_grid, "tsd")
            else int(self._high_grid.log_odds.shape[0]),
        )
        return self._run(high_cloud, low_cloud, initial_pose, config, scan_histogram, initial_yaw)
