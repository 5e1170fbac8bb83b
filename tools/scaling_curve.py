"""Virtual-mesh scaling curve for the sharded back-end workloads.

Multi-chip hardware is unavailable in this environment (one tunneled v5e
chip), so the prescribed stand-in for the 2-host scaling-efficiency
north star (SURVEY.md §2.12 #3) is a strong-scaling curve on a virtual
CPU mesh: the SAME fixed-size problem solved on 1/2/4/8
`xla_force_host_platform_device_count` devices. Virtual devices share
one host's cores, so ideal speedup is NOT expected — the curve's value
is (a) the collective/partition overhead trend as the mesh grows and
(b) proof the sharded programs run unchanged at every mesh size
(ref parity: the reference scales its back-end by thread count,
pose_graph.lua:16 `num_background_threads`; we scale by mesh axis).

Workloads (both are the production back-end's hot launches):
  * sharded SPA-3D at the production operating point
    (500 submaps / 5000 nodes / 20k constraints, 10 LM iterations)
  * sharded 3D constraint-search round: every (node, finished-submap)
    candidate scored in ONE launch (constraint_builder_3d.cc:162-189's
    fan-out, re-designed as a mesh program)

Usage:  python -m tools.scaling_curve            # full curve, markdown
        python -m tools.scaling_curve --child N  # one mesh size (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(n_devices: int) -> None:
    # Platform + device count arrive via the parent's env (see main);
    # re-assert through jax.config for safety against pre-imported jax.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    from hectorgrapher_tpu.evaluation.graph_generator import make_scale_spa_problem
    from hectorgrapher_tpu.parallel.sharded import solve_spa_3d_sharded

    mesh = Mesh(np.asarray(jax.devices()), ("graph",))
    out = {"devices": n_devices}

    # --- SPA-3D at production scale (fixed size: strong scaling) --------
    from hectorgrapher_tpu.parallel.sharded import spa_sharded_collective_ops

    problem, _, _ = make_scale_spa_problem(5000, 500, 20000, noise=0.5, seed=0)
    r = solve_spa_3d_sharded(problem, mesh, num_iterations=10)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve_spa_3d_sharded(problem, mesh, num_iterations=10)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    out["spa3d_s"] = round(min(ts), 4)
    # Static collective-op census of the compiled solve (VERDICT r4 #3:
    # record psums-per-solve alongside the times).
    out["spa3d_collectives"] = spa_sharded_collective_ops(
        problem, mesh, num_iterations=10
    )

    # --- sharded 3D constraint-search round ------------------------------
    from hectorgrapher_tpu.common.config import (
        FastCorrelativeScanMatcherOptions3D,
        TSDFRangeDataInserterOptions3D,
    )
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
    from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
    from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
    from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_3d import (
        FastCorrelativeScanMatcher3D,
        make_fast_search_3d_config,
    )
    from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import (
        compute_histogram,
    )
    from hectorgrapher_tpu.parallel.constraint_search import (
        pack_submaps_3d,
        sharded_fast_matches_3d_packed,
    )
    from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
    from hectorgrapher_tpu.sensor.voxel_filter import compact_cloud, voxel_filter
    from hectorgrapher_tpu.transform import np_quat as nq
    from hectorgrapher_tpu.transform.rigid import Rigid3

    options = FastCorrelativeScanMatcherOptions3D(
        branch_and_bound_depth=4,
        linear_xy_search_window=1.0,
        linear_z_search_window=0.3,
        angular_search_window=np.radians(15.0),
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
        pts = raycast_box_room_3d(
            center, nq.quat_identity(), half_extents=(3.0, 2.5, 1.2),
            num_azimuth=96, num_elevation=20, noise_std=0.003, rng=rng,
        )
        pts = pts[~np.isnan(pts[:, 0])] + center
        rd = RangeData(
            origin=jnp.asarray(center, jnp.float32),
            returns=pad_cloud(pts.astype(np.float32), 4096),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 4),
        )
        hc = pad_cloud(pts.astype(np.float32), 4096)
        hist = np.asarray(compute_histogram(hc.positions, hc.mask, 120))
        matchers.append(FastCorrelativeScanMatcher3D(options, ins_hi(hi, rd), ins_lo(lo, rd), hist))
        scan = compact_cloud(voxel_filter(hc, 0.2), 512)
        low_c = compact_cloud(voxel_filter(hc, 0.45), 256)
        clouds.append((scan, low_c, compute_histogram(scan.positions, scan.mask, 120)))

    candidates = []
    for s in range(8):
        scan, low_c, scan_hist = clouds[s]
        for _ in range(4):  # 32-candidate round, the bench's round size
            candidates.append((s, scan, low_c, scan_hist, Rigid3.identity(), 0.0))

    config = make_fast_search_3d_config(options, 0.15, 8.0, False, 256)
    packed = pack_submaps_3d(matchers, mesh)
    res = sharded_fast_matches_3d_packed(packed, candidates, config, mesh)
    assert len(res) == len(candidates) and res[0][0] > 0.2
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sharded_fast_matches_3d_packed(packed, candidates, config, mesh)
        ts.append(time.perf_counter() - t0)
    out["cs3d_round_s"] = round(min(ts), 4)
    print("SCALING " + json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--sizes", type=str, default="1,2,4,8")
    args = ap.parse_args()
    if args.child:
        _child(args.child)
        return
    rows = []
    for n in [int(x) for x in args.sizes.split(",")]:
        env = dict(os.environ)
        # Pin the CPU platform IN THE ENVIRONMENT: the ambient axon site
        # hook imports jax during interpreter startup, so the child's own
        # os.environ writes come too late and it would silently run (and
        # OOM) on the tunneled TPU chip.
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        )
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hg_tpu_jax_cache")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("SCALING ")), None
        )
        if proc.returncode != 0 or line is None:
            print(f"devices={n} FAILED:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
            continue
        rows.append(json.loads(line[len("SCALING "):]))
    print("\n| Virtual devices | SPA-3D 5k-node (s) | SPA collective HLO ops | 3D constraint round, 32 cands (s) |")
    print("|---|---|---|---|")
    for r in rows:
        coll = r.get("spa3d_collectives", {})
        print(
            f"| {r['devices']} | {r['spa3d_s']} | {coll.get('total', '?')} "
            f"(ar={coll.get('all-reduce', '?')}, ag={coll.get('all-gather', '?')}) "
            f"| {r['cs3d_round_s']} |"
        )


if __name__ == "__main__":
    main()
