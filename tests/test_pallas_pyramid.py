"""Pallas fused max-pool pyramid == XLA reference (interpret mode on CPU).

(ref: fast_correlative_scan_matcher_2d.cc PrecomputationGrid2D — level d is
the running max over 2^d x 2^d windows.)"""

import numpy as np
import jax.numpy as jnp

from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
    precompute_pyramid_2d,
)
from hectorgrapher_tpu.ops.pallas_pyramid import pyramid_2d, pyramid_2d_pallas


def test_pallas_pyramid_matches_xla():
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.uniform(0.1, 0.9, (256, 128)).astype(np.float32))
    depth = 5
    ref = precompute_pyramid_2d(values, depth)
    got = pyramid_2d_pallas(values, depth, tile_x=64, interpret=True)
    assert len(got) == len(ref)
    for d, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), err_msg=f"level {d}")


def test_pallas_pyramid_tile_spans_halo():
    # halo (2^(depth-1) = 16) reaches into the next-but-one tile when
    # tile_x=8 would be too small; use tile_x=32 > halo and tile_x=64.
    rng = np.random.default_rng(1)
    values = jnp.asarray(rng.uniform(0.0, 1.0, (128, 64)).astype(np.float32))
    ref = precompute_pyramid_2d(values, 4)
    for tile_x in (32, 64, 128):
        got = pyramid_2d_pallas(values, 4, tile_x=tile_x, interpret=True)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r))


def test_pyramid_wrapper_falls_back_on_cpu():
    rng = np.random.default_rng(2)
    values = jnp.asarray(rng.uniform(0.0, 1.0, (64, 64)).astype(np.float32))
    ref = precompute_pyramid_2d(values, 3)
    got = pyramid_2d(values, 3)  # default backend choice (XLA)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r))
