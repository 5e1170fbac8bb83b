"""Time ONLY the batched fast-match launch at the production operating
point, for kernel A/B experiments. HG_FM_MODE selects the contraction in
score_sum (einsum | mul)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hectorgrapher_tpu.common.config import (
    FastCorrelativeScanMatcherOptions2D,
    ProbabilityGridRangeDataInserterOptions2D,
)
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.grids import make_probability_grid
from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
    make_fast_search_config,
    prepare_fast_matcher_2d,
)
from hectorgrapher_tpu.parallel import constraint_search as cs
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.transform.rigid import Rigid2
from jax.sharding import Mesh


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1])
            return


def chain_time(fn, iters=4, repeats=3):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        _sync(out)
        return time.perf_counter() - t0

    run(1)
    slopes = []
    for _ in range(repeats):
        t1 = run(1)
        tn = run(iters)
        slopes.append(max(tn - t1, 1e-9) / (iters - 1))
    return float(np.median(slopes))


def main():
    grid = make_probability_grid(0.05, (256, 256))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=12.8, resolution=0.05
    )
    pts = raycast_rect_room_2d(np.zeros(2), 0.0, half_width=4.02, half_height=3.41, num_rays=720)
    pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
    cloud = pad_cloud(pts, 512)
    grid = insert(
        grid,
        RangeData(
            origin=jnp.zeros(3, jnp.float32),
            returns=cloud,
            misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
        ),
    )
    fc = FastCorrelativeScanMatcherOptions2D()
    max_scan_range = float(np.linalg.norm(pts, axis=-1).max())
    config = make_fast_search_config(
        fc.linear_search_window, fc.angular_search_window, 0.05, max_scan_range,
        fc.branch_and_bound_depth,
    )
    print("config:", config, flush=True)
    prepared = prepare_fast_matcher_2d(grid, config.depth)
    mesh = Mesh(np.asarray(jax.devices()), ("graph",))
    packed = cs.pack_submaps_2d([prepared] * 32, mesh)
    initial = Rigid2(
        translation=np.zeros(2, np.float32), angle=np.float32(0.0)
    )
    candidates = [(i, cloud, initial) for i in range(32)]
    arrays, _ = cs.build_candidate_arrays_2d(candidates, packed.s_per_dev, 1)

    def fm():
        return cs.launch_fast_matches_2d(packed, arrays, config, mesh)

    t0 = time.perf_counter()
    _sync(fm())
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t = chain_time(fm)
    print(f"fm_launch (32 cands): {t * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
