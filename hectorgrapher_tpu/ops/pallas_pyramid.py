"""Pallas TPU kernel: fused max-pool pyramid construction.

The loop-closure matchers precompute max-pool stacks (ref:
fast_correlative_scan_matcher_2d.cc PrecomputationGrid2D): level d holds
the running maximum over [x, x+2^d) x [y, y+2^d). The XLA fallback
(scan_matching/fast_correlative_2d.py:precompute_pyramid_2d) materializes
each level with two shifted-max passes — reading and writing HBM once per
level. This kernel computes ALL levels in one pass: each x-tile (plus an
x-halo of 2^(depth-1) rows) is DMA'd into VMEM once and every level's
tile is produced from on-chip data — HBM read traffic drops from
~depth x grid to ~1.5 x grid.

Falls back to the XLA implementation off-TPU; equivalence is tested in
interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import precompute_pyramid_2d


def _make_kernel(depth: int, tile_x: int, halo: int, ny: int):
    def kernel(hbm_ref, *args):
        out_refs = args[:depth]
        scratch = args[depth]
        sem = args[depth + 1]
        i = pl.program_id(0)
        # Halo read: rows [i*tile_x, i*tile_x + tile_x + halo) into VMEM.
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * tile_x, tile_x + halo), :], scratch, sem
        )
        dma.start()
        dma.wait()
        current = scratch[:]
        out_refs[0][:] = current[:tile_x, :]
        for d in range(1, depth):
            w = 2 ** (d - 1)
            shifted_x = jnp.concatenate(
                [current[w:, :], jnp.full((w, ny), -jnp.inf, current.dtype)], axis=0
            )
            m = jnp.maximum(current, shifted_x)
            shifted_y = jnp.concatenate(
                [m[:, w:], jnp.full((m.shape[0], w), -jnp.inf, current.dtype)], axis=1
            )
            current = jnp.maximum(m, shifted_y)
            out_refs[d][:] = current[:tile_x, :]

    return kernel


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("depth", "tile_x", "interpret"))
def pyramid_2d_pallas(values, depth: int, tile_x: int = 128, interpret: bool = False):
    """Compute the same stack as precompute_pyramid_2d in one fused kernel.

    values: (nx, ny) f32 with nx divisible by tile_x.
    Returns a list of `depth` arrays shaped like values.
    """
    nx, ny = values.shape
    halo = 2 ** (depth - 1)
    assert nx % tile_x == 0, "pad nx to a multiple of tile_x"

    padded = jnp.concatenate(
        [values, jnp.full((halo, ny), -jnp.inf, values.dtype)], axis=0
    )

    grid = (nx // tile_x,)
    out_specs = tuple(
        pl.BlockSpec((tile_x, ny), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(depth)
    )
    out_shape = tuple(jax.ShapeDtypeStruct((nx, ny), values.dtype) for _ in range(depth))

    outs = pl.pallas_call(
        _make_kernel(depth, tile_x, halo, ny),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_x + halo, ny), values.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return list(outs)


def pyramid_2d(values, depth: int, use_pallas: bool = None) -> List[jax.Array]:
    """Pyramid with backend choice.

    Measured on a real v5e chip (1024x1024, depth 7): XLA 454 us vs Pallas
    505 us — the op is write-bandwidth/dispatch dominated (all `depth`
    levels must be written either way) and XLA fully fuses the shifted-max
    chain, so the fused-read kernel does not win. Default stays XLA; the
    kernel remains available for fusion into larger pipelines where the
    levels are consumed on-chip.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        try:
            nx = values.shape[0]
            tile = 128 if nx % 128 == 0 else (64 if nx % 64 == 0 else None)
            if tile is not None:
                return pyramid_2d_pallas(values, depth, tile_x=tile)
        except Exception:
            pass
    return precompute_pyramid_2d(values, depth)
