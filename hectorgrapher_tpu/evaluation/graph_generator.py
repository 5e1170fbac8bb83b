"""Synthetic large pose-graph generator for SPA scaling tests/benches.

(ref: the reference's SPA operating point — pose_graph.lua
optimize_every_n_nodes=90 over multi-thousand-node graphs; its
optimization_problem tests build small hand graphs, this generates the
production-scale shape: S submaps, N nodes, C constraints with INTRA
chains plus random INTER loop closures.)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_scale_spa_problem(
    num_nodes: int = 5000,
    num_submaps: int = 500,
    num_constraints: int = 20000,
    noise: float = 0.5,
    seed: int = 0,
    dtype=np.float32,
):
    """Build a SpaProblem3D whose ground truth is recoverable.

    A snake trajectory with 10 nodes per submap (wrapping over the submap
    set to create revisits), INTRA constraints node->submap (+ previous
    submap on even nodes), and random INTER closures filling to
    num_constraints. Initial poses are ground truth + N(0, noise).
    Returns (problem, node_translation_gt, submap_translation_gt).
    """
    import jax.numpy as jnp

    from hectorgrapher_tpu.mapping.pose_graph.optimization import SpaProblem3D

    rng = np.random.default_rng(seed)
    N, S = num_nodes, num_submaps

    t_gt = np.zeros((N, 3))
    for i in range(1, N):
        t_gt[i] = t_gt[i - 1] + np.array([0.5, 0.02 * np.sin(i * 0.1), 0.0])
    q_id = np.tile([1.0, 0.0, 0.0, 0.0], (N, 1))

    sub_of = np.arange(N) // 10 % S
    s_t = np.zeros((S, 3))
    seen = set()
    for i in range(N):
        s = int(sub_of[i])
        if s not in seen:
            seen.add(s)
            s_t[s] = t_gt[i]

    cs, cn, crt = [], [], []
    for i in range(N):
        targets = [int(sub_of[i])]
        if sub_of[i] > 0 and i % 2 == 0:
            targets.append(int(sub_of[i]) - 1)
        for s in targets:
            cs.append(s)
            cn.append(i)
            crt.append(t_gt[i] - s_t[s])
    while len(cs) < num_constraints:
        i = int(rng.integers(0, N))
        s = int(rng.integers(0, S))
        cs.append(s)
        cn.append(i)
        crt.append(t_gt[i] - s_t[s])
    C = len(cs)

    t0 = t_gt + rng.normal(0, noise, (N, 3))
    t0[0] = t_gt[0]
    st0 = s_t + rng.normal(0, noise, (S, 3))
    st0[0] = s_t[0]

    problem = SpaProblem3D(
        submap_translation=jnp.asarray(st0, dtype),
        submap_rotation=jnp.asarray(np.tile([1.0, 0, 0, 0], (S, 1)), dtype),
        node_translation=jnp.asarray(t0, dtype),
        node_rotation=jnp.asarray(q_id, dtype),
        submap_fixed=jnp.asarray(np.arange(S) == 0),
        node_fixed=jnp.zeros(N, bool),
        c_submap=jnp.asarray(cs, jnp.int32),
        c_node=jnp.asarray(cn, jnp.int32),
        c_mask=jnp.ones(C, bool),
        c_rel_translation=jnp.asarray(crt, dtype),
        c_rel_rotation=jnp.asarray(np.tile([1.0, 0, 0, 0], (C, 1)), dtype),
        c_translation_weight=jnp.full(C, 100.0, dtype),
        c_rotation_weight=jnp.full(C, 30.0, dtype),
        c_huber_scale=jnp.full(C, 1e6, dtype),
    )
    return problem, t_gt, s_t
