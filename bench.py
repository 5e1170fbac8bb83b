"""Benchmark on the real TPU chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): scan-matches/s/chip for the online
matcher (dense correlative + Gauss-Newton refinement, the reference's
RealTimeCorrelativeScanMatcher2D + CeresScanMatcher2D pair, ref:
local_trajectory_builder_2d.cc ScanMatch:65-102). Secondary numbers (CT
window solves/s — the 3D flagship step — and SPA solve time) go to
stderr.

Baseline: the reference publishes no numbers (BASELINE.md). Until the
C++ pipeline is run on this machine, vs_baseline is computed against a
documented estimate of the C++ online matcher: Cartographer's RTCSM+Ceres
on one CPU core handles roughly 50-100 scans/s at these window sizes
(0.15 m / 10 deg window, ~500-point clouds, 10-20 GN iterations); we use
100/s as a deliberately generous reference point.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

CPP_BASELINE_MATCHES_PER_S = 100.0

# One JSON line must reach stdout no matter how the TPU tunnel misbehaves
# (raise, hang, or die mid-bench). _RECORD is filled in progressively;
# _emit prints it exactly once.
_RECORD = {
    "metric": "scan_matches_per_s_per_chip",
    "value": None,
    "unit": "matches/s",
    "vs_baseline": None,
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit() -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(_RECORD), flush=True)


def bench_scan_matcher():
    import jax
    import jax.numpy as jnp

    from hectorgrapher_tpu.common.config import ProbabilityGridRangeDataInserterOptions2D
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
    from hectorgrapher_tpu.mapping.grids import make_probability_grid
    from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
    from hectorgrapher_tpu.mapping.scan_matching.correlative_2d import (
        make_search_window,
        match_correlative_2d_batched,
        prepare_correlative_table,
    )
    from hectorgrapher_tpu.mapping.scan_matching.gn_2d import (
        match_gn_2d_probability_batched,
        prepare_gn_probability_field,
    )
    from hectorgrapher_tpu.sensor.types import PointCloud, RangeData, pad_cloud
    from hectorgrapher_tpu.transform.rigid import Rigid2

    grid = make_probability_grid(0.05, (256, 256))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=12.8, resolution=0.05
    )
    pts = raycast_rect_room_2d(np.zeros(2), 0.0, half_width=4.02, half_height=3.41, num_rays=720)
    pts = pts[~np.isnan(pts[:, 0])]
    cloud = pad_cloud(pts.astype(np.float32), 512)
    grid = insert(
        grid,
        RangeData(
            origin=jnp.zeros(3, jnp.float32),
            returns=cloud,
            misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
        ),
    )
    initial = Rigid2(translation=jnp.array([0.07, -0.05], jnp.float32), angle=jnp.asarray(0.02, jnp.float32))
    # Angular step from the ACTUAL scan range, as the reference computes
    # per scan (correlative_scan_matcher_2d.cc SearchParameters).
    max_scan_range = float(np.linalg.norm(pts, axis=-1).max())
    window = make_search_window(0.15, np.radians(10.0), 0.05, max_scan_range)

    # Server operating point: the multi-robot MapBuilderServer batches
    # concurrent scans; per-chip throughput is measured at a batch that
    # saturates the chip (latency at 1024 is ~40 ms, well inside the
    # reference's per-scan real-time budget for a fleet). The gather
    # table / wide-row field are built once per grid VERSION and reused
    # across the matches against it — the analog of the reference's
    # per-submap precomputation grids.
    batch = 1024
    clouds = PointCloud(
        positions=jnp.broadcast_to(cloud.positions, (batch,) + cloud.positions.shape),
        mask=jnp.broadcast_to(cloud.mask, (batch,) + cloud.mask.shape),
    )
    initials = Rigid2(
        translation=jnp.broadcast_to(initial.translation, (batch, 2)),
        angle=jnp.broadcast_to(initial.angle, (batch,)),
    )
    table = prepare_correlative_table(grid, window)
    field = prepare_gn_probability_field(grid)

    def step():
        scores, coarse = match_correlative_2d_batched(
            grid, clouds, initials, window, 0.1, 0.1, prepared_table=table
        )
        poses, costs = match_gn_2d_probability_batched(
            grid, clouds, coarse, initials.translation, 1.0, 10.0, 40.0,
            num_iterations=10, prepared_field=field,
        )
        return poses, scores, costs

    out = step()
    jax.block_until_ready(out)

    # Min of 3 timing loops: one tunnel hiccup must not tax the record.
    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def bench_ct_window():
    import jax

    from __graft_entry__ import entry

    step, args = entry()
    jit_step = jax.jit(step)
    out = jit_step(*args)
    jax.block_until_ready(out)
    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jit_step(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return iters / best


def bench_ct_window_batched(batch: int = 8):
    """Server operating point: many trajectories' window solves batched
    onto one chip (solve_ct_window_batched). Returns windows/s."""
    import functools

    import jax

    from __graft_entry__ import _build_ct_example
    from hectorgrapher_tpu.mapping.ct.window_solver import solve_ct_window_batched

    hi, lo, problem, state, weights = _build_ct_example()

    def bcast(t):
        import jax.numpy as jnp

        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), t)

    his, los, probs, states = bcast(hi), bcast(lo), bcast(problem), bcast(state)
    step = functools.partial(
        solve_ct_window_batched, is_tsdf=True, num_iterations=8
    )
    out = step(his, los, probs, states, weights)
    jax.block_until_ready(out)
    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(his, los, probs, states, weights)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def bench_spa():
    import jax
    import jax.numpy as jnp

    from hectorgrapher_tpu.mapping.pose_graph.optimization import SpaProblem3D, solve_spa_3d

    rng = np.random.default_rng(0)
    S, N, C = 64, 512, 2048
    qS = np.tile(np.array([1, 0, 0, 0], np.float32), (S, 1))
    qN = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
    qC = np.tile(np.array([1, 0, 0, 0], np.float32), (C, 1))
    problem = SpaProblem3D(
        submap_translation=jnp.asarray(rng.normal(0, 1, (S, 3)).astype(np.float32)),
        submap_rotation=jnp.asarray(qS),
        node_translation=jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32)),
        node_rotation=jnp.asarray(qN),
        submap_fixed=jnp.asarray([True] + [False] * (S - 1)),
        node_fixed=jnp.zeros(N, bool),
        c_submap=jnp.asarray((rng.integers(0, S, C)).astype(np.int32)),
        c_node=jnp.asarray((rng.integers(0, N, C)).astype(np.int32)),
        c_mask=jnp.ones(C, bool),
        c_rel_translation=jnp.asarray(rng.normal(0, 1, (C, 3)).astype(np.float32)),
        c_rel_rotation=jnp.asarray(qC),
        c_translation_weight=jnp.full(C, 10.0, jnp.float32),
        c_rotation_weight=jnp.full(C, 10.0, jnp.float32),
        c_huber_scale=jnp.full(C, 10.0, jnp.float32),
    )
    out = solve_spa_3d(problem, num_iterations=50)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = solve_spa_3d(problem, num_iterations=50)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def bench_spa_scale():
    """SPA at the reference's production operating point (VERDICT #8):
    5k nodes / 500 submaps / 20k constraints, 10 LM iterations."""
    import jax

    from hectorgrapher_tpu.evaluation.graph_generator import make_scale_spa_problem
    from hectorgrapher_tpu.mapping.pose_graph.optimization import solve_spa_3d

    problem, _, _ = make_scale_spa_problem(5000, 500, 20000, noise=0.5, seed=0)
    out = solve_spa_3d(problem, num_iterations=10)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = solve_spa_3d(problem, num_iterations=10)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def _probe_backend(timeout_s: float) -> tuple:
    """Check tunnel health in a SUBPROCESS bounded by a hard timeout.

    A dead axon tunnel does not raise — jax.devices() simply hangs
    (observed: >3 min with zero output), so in-process try/except cannot
    bound it. The subprocess fully exits before the main process touches
    the device (the tunnel serves one TPU process at a time).
    """
    code = "import jax.numpy as jnp; print(float(jnp.zeros(()) + 0.0))"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hung past {timeout_s:.0f}s"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return False, tail[-1] if tail else f"probe rc={proc.returncode}"
    return True, ""


def _warm_up_backend(attempts: int = 5, backoff_s: float = 30.0, probe_timeout_s: float = 120.0) -> None:
    """Establish a healthy TPU backend and force one device-to-host fetch.

    The fetch is load-bearing twice over: (1) it is the first point the
    axon PJRT plugin actually dials the tunnel, so failures surface here,
    and (2) until one D2H fetch has happened the tunnel defers execution
    and block_until_ready does not wait, so every timing loop would
    measure enqueue time only. Round 1 died with rc=1 on a single
    UNAVAILABLE at this exact point (BENCH_r01.json); a later repro showed
    the failure can also be a silent HANG. Bounded subprocess probes with
    backoff make both modes non-fatal.
    """
    last = ""
    for attempt in range(attempts):
        ok, err = _probe_backend(probe_timeout_s)
        if ok:
            import jax.numpy as jnp

            # Tunnel verified healthy moments ago; the in-process fetch is
            # covered by the global watchdog if it still manages to hang.
            float(jnp.zeros(()) + 0.0)
            return
        last = err
        print(f"backend probe {attempt + 1}/{attempts} failed: {err}", file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(backoff_s)
    raise RuntimeError(f"TPU backend unavailable after {attempts} probes: {last}")


def main() -> None:
    # Watchdog: if anything below hangs past the wall budget, emit the
    # partially-filled record and exit 0 so the driver records a parseable
    # result instead of killing an empty process.
    budget = float(os.environ.get("BENCH_WALL_BUDGET_S", "1500"))

    def _watchdog():
        _RECORD.setdefault("error", f"wall budget {budget:.0f}s exceeded (TPU tunnel hang)")
        _emit()
        os._exit(0)

    timer = threading.Timer(budget, _watchdog)
    timer.daemon = True
    timer.start()

    try:
        _warm_up_backend()
    except Exception as e:
        # Emit a parseable JSON line even on total backend failure so the
        # driver records the error instead of a bare rc=1 traceback.
        _RECORD["error"] = f"backend init failed: {e}"
        _emit()
        return

    try:
        matches_per_s = bench_scan_matcher()
        _RECORD["value"] = round(matches_per_s, 1)
        _RECORD["vs_baseline"] = round(matches_per_s / CPP_BASELINE_MATCHES_PER_S, 2)
    except Exception as e:
        _RECORD["error"] = f"scan matcher bench failed: {e}"
    try:
        _RECORD["ct_window_solves_per_s"] = round(bench_ct_window(), 1)
    except Exception as e:  # secondary metric must not kill the bench
        _RECORD["ct_error"] = str(e)
    try:
        _RECORD["ct_batched_windows_per_s"] = round(bench_ct_window_batched(), 1)
    except Exception as e:
        _RECORD["ct_batched_error"] = str(e)
    try:
        _RECORD["spa_solve_s"] = round(bench_spa(), 3)
    except Exception as e:
        _RECORD["spa_error"] = str(e)
    try:
        _RECORD["spa_scale_5k_solve_s"] = round(bench_spa_scale(), 3)
    except Exception as e:
        _RECORD["spa_scale_error"] = str(e)

    timer.cancel()
    _emit()


if __name__ == "__main__":
    main()
