"""SPA at the reference's production operating point (VERDICT #8).

The reference runs SPA every 90 nodes over multi-thousand-node graphs
(ref: configuration_files/pose_graph.lua:16, pose_graph_3d.cc
RunOptimization). This exercises the production-scale path — vmapped
per-constraint Jacobians + matrix-free block-Jacobi PCG (auto-dispatched
above the Schur coupling budget) — at 5k nodes / 500 submaps / 20k
constraints and asserts it converges back to ground truth from heavy
initial noise.
"""

import time

import jax
import numpy as np
import pytest

from hectorgrapher_tpu.evaluation.graph_generator import make_scale_spa_problem
from hectorgrapher_tpu.mapping.pose_graph.optimization import solve_spa_3d


@pytest.mark.slow
def test_spa_converges_at_5k_nodes_500_submaps_20k_constraints():
    problem, t_gt, s_gt = make_scale_spa_problem(
        num_nodes=5000, num_submaps=500, num_constraints=20000, noise=0.5, seed=0
    )

    def _rss_mb() -> float:
        with open("/proc/self/status") as f:
            return next(
                int(line.split()[1]) for line in f if line.startswith("VmRSS:")
            ) / 1024

    rss_before = _rss_mb()
    t0 = time.perf_counter()
    st, sq, nt, nq, cost = jax.block_until_ready(solve_spa_3d(problem, num_iterations=10))
    wall = time.perf_counter() - t0

    node_err = np.linalg.norm(np.asarray(nt) - t_gt, axis=1)
    submap_err = np.linalg.norm(np.asarray(st) - s_gt, axis=1)
    # From 0.5 m gaussian noise the graph must snap back to ground truth.
    assert node_err.max() < 0.01, node_err.max()
    assert submap_err.max() < 0.01, submap_err.max()
    assert float(cost) < 1.0

    # Memory guard: the CG path's footprint is O(C*6*12 + (S+N)*36) —
    # no (S, N) coupling tensor. Measure the DELTA across the solve: the
    # absolute RSS of a long pytest process accumulates allocator caches
    # from every earlier test (a full-suite run carries ~8 GB of residue),
    # while the Schur-path regression this guards against would add ~9.5 GB
    # HERE.
    rss_delta = _rss_mb() - rss_before
    print(
        f"spa-scale: N=5000 S=500 C=20000 solve {wall:.1f}s "
        f"(incl. compile) RSS delta {rss_delta:.0f} MB"
    )
    assert rss_delta < 4096, rss_delta
