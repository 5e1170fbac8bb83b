"""Pallas TPU kernel: fused candidate-cell preparation for the 2D
correlative matcher.

Computes, for a batch of matches, the gather index of each (group, point)
wide-patch row and the per-(angle, point) cell delta within its group —
the "prep" stage of correlative_2d.match_correlative_2d (ref:
correlative_scan_matcher_2d.cc DiscreteScan2D / SearchParameters). XLA
executes this stage as a chain of materialized (B, T, N, 2) elementwise
ops (~4.5 ms per 1024-batch on v5e); fused into one kernel it is pure
VPU arithmetic on (TB, N) tiles with only the two small outputs written
to HBM (~0.4 ms).

Exact-arithmetic note: the kernel evaluates the same f32 expression tree
as the XLA path (rotate in meters, add translation, subtract the grid
origin, divide by resolution, floor), so the discretized cells agree
bit-for-bit and the batched matcher reproduces the per-match one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 8


def _make_kernel(n_groups: int, gsz: int, margin: int, ex: int, ey: int):
    half = gsz // 2
    t_pad = n_groups * gsz

    def kernel(params_ref, px_ref, py_ref, ca_ref, sa_ref, flat_ref, dlin_ref):
        px = px_ref[:]  # (TB, N) meters, tracking frame
        py = py_ref[:]
        p = params_ref[:]  # (TB, 8): [tx, ty, minx, miny, ...]
        tx = p[:, 0:1]
        ty = p[:, 1:2]
        minx = p[:, 2:3]
        miny = p[:, 3:4]
        resolution = p[:, 4:5]

        def cells(t):
            c = ca_ref[:, t : t + 1]  # (TB, 1)
            s = sa_ref[:, t : t + 1]
            ix = jnp.floor(((c * px - s * py + tx) - minx) / resolution)
            iy = jnp.floor(((s * px + c * py + ty) - miny) / resolution)
            return ix.astype(jnp.int32), iy.astype(jnp.int32)

        for g in range(n_groups):
            cx, cy = cells(g * gsz + half)
            cxe = cx + margin
            cye = cy + margin
            in_ext = (cxe >= 0) & (cxe < ex) & (cye >= 0) & (cye < ey)
            flat_ref[:, g, :] = jnp.where(in_ext, cxe * ey + cye, ex * ey)
            for l in range(gsz):
                if l == half:
                    ix, iy = cx, cy
                else:
                    ix, iy = cells(g * gsz + l)
                dx = jnp.clip(ix - cx, -half, half) + half
                dy = jnp.clip(iy - cy, -half, half) + half
                dlin_ref[:, g * gsz + l, :] = dx * gsz + dy

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_groups", "gsz", "margin", "ex", "ey", "interpret"),
)
def correlative_prep_2d_batched(
    params, px, py, ca, sa,
    n_groups: int, gsz: int, margin: int, ex: int, ey: int,
    interpret: bool = False,
):
    """Batched prep: returns (flat (B, G, N) int32, delta_lin (B, T, N) int32).

    params: (B, 8) f32 [tx, ty, min_x, min_y, resolution, 0...]; px/py: (B, N) f32
    tracking-frame meters; ca/sa: (B, T) f32 candidate-angle cos/sin.
    B must be a multiple of TILE_B (pad outside); N a multiple of 128.
    """
    b, n = px.shape
    t_pad = n_groups * gsz
    grid = (b // TILE_B,)
    spec2 = pl.BlockSpec((TILE_B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((TILE_B, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(n_groups, gsz, margin, ex, ey),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_groups, n), jnp.int32),
            jax.ShapeDtypeStruct((b, t_pad, n), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            spec2,
            spec2,
            spec_t,
            spec_t,
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, n_groups, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, t_pad, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(params, px, py, ca, sa)
