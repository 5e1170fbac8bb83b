"""Time the batched 3D fast-match launch at a production-like operating
point (8 submaps, 32 candidates, 64^2x32 hi grids)."""
import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh

from hectorgrapher_tpu.common.config import (
    FastCorrelativeScanMatcherOptions3D, TSDFRangeDataInserterOptions3D)
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D, make_fast_search_3d_config)
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import compute_histogram
from hectorgrapher_tpu.parallel import constraint_search as cs
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import compact_cloud, voxel_filter
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.rigid import Rigid3


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1]); return


def chain_time(fn, iters=4, repeats=3):
    def run(n):
        t0 = time.perf_counter(); out = None
        for _ in range(n): out = fn()
        _sync(out); return time.perf_counter() - t0
    run(1)
    slopes = []
    for _ in range(repeats):
        t1 = run(1); tn = run(iters)
        slopes.append(max(tn - t1, 1e-9) / (iters - 1))
    return float(np.median(slopes))


def main():
    options = FastCorrelativeScanMatcherOptions3D(
        branch_and_bound_depth=4,
        linear_xy_search_window=7.0,  # production loop-closure window
        linear_z_search_window=1.0,
        angular_search_window=np.radians(30.0),
        min_rotational_score=0.2,
    )
    ins_opts = TSDFRangeDataInserterOptions3D(
        normal_computation_method="NONE", min_range=0.4, max_range=30.0
    )
    ins_hi = make_tsdf_inserter_3d(ins_opts, 0.15)
    ins_lo = make_tsdf_inserter_3d(ins_opts, 0.45)
    rng = np.random.default_rng(5)
    matchers, clouds = [], []
    for s in range(8):
        hi = make_tsdf_grid(0.15, (64, 64, 32), truncation_distance=0.45, max_weight=1000.0)
        lo = make_tsdf_grid(0.45, (24, 24, 12), truncation_distance=1.0, max_weight=1000.0)
        center = np.array([0.3 * s, -0.2 * s, 0.0], np.float32)
        pts = raycast_box_room_3d(center, nq.quat_identity(), half_extents=(3.0, 2.5, 1.2),
                                  num_azimuth=96, num_elevation=20, noise_std=0.003, rng=rng)
        pts = pts[~np.isnan(pts[:, 0])] + center
        rd = RangeData(origin=jnp.asarray(center, jnp.float32),
                       returns=pad_cloud(pts.astype(np.float32), 4096),
                       misses=pad_cloud(np.zeros((0, 3), np.float32), 4))
        hc = pad_cloud(pts.astype(np.float32), 4096)
        hist = np.asarray(compute_histogram(hc.positions, hc.mask, 120))
        matchers.append(FastCorrelativeScanMatcher3D(options, ins_hi(hi, rd), ins_lo(lo, rd), hist))
        scan = compact_cloud(voxel_filter(hc, 0.2), 512)
        low_c = compact_cloud(voxel_filter(hc, 0.45), 256)
        clouds.append((scan, low_c, compute_histogram(scan.positions, scan.mask, 120)))

    mesh = Mesh(np.asarray(jax.devices()), ("graph",))
    packed = cs.pack_submaps_3d(matchers, mesh)
    candidates = []
    for s in range(8):
        scan, low_c, sh = clouds[s]
        for _ in range(4):
            candidates.append((s, scan, low_c, sh, Rigid3.identity(), 0.0))
    config = make_fast_search_3d_config(options, 0.15, 5.66, False, 256)
    print("config:", config, flush=True)
    arrays, _ = cs.build_candidate_arrays_3d(candidates, packed.s_per_dev, 1, 120)

    def fm():
        return cs.launch_fast_matches_3d(packed, arrays, config, mesh)

    t0 = time.perf_counter()
    _sync(fm())
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t = chain_time(fm)
    print(f"fm3d launch (32 cands): {t * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
