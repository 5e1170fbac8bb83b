"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: multi-host tests run single-host with a simulated
mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hectorgrapher_tpu.mapping.pose_graph.optimization import (
    SpaProblem2D,
    solve_spa_2d,
)
from hectorgrapher_tpu.parallel.sharded import solve_spa_2d_sharded


def build_problem(rng, S=8, N=32, C=128):
    gt_sub = rng.uniform(-3, 3, (S, 3)).astype(np.float32)
    gt_node = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    sub = gt_sub + rng.normal(0, 0.1, (S, 3)).astype(np.float32)
    node = gt_node + rng.normal(0, 0.1, (N, 3)).astype(np.float32)
    sub[0] = gt_sub[0]

    def rel(s, n):
        c, si = np.cos(s[2]), np.sin(s[2])
        d = n[:2] - s[:2]
        return [c * d[0] + si * d[1], -si * d[0] + c * d[1], n[2] - s[2]]

    cs, cn, crel = [], [], []
    for ni in range(N):
        for si in [ni % S, (ni + 1) % S]:
            cs.append(si)
            cn.append(ni)
            crel.append(rel(gt_sub[si], gt_node[ni]))
    Ca = len(cs)
    pad = C - Ca
    assert pad >= 0
    return SpaProblem2D(
        submap_pose=jnp.asarray(sub),
        node_pose=jnp.asarray(node),
        submap_fixed=jnp.asarray([True] + [False] * (S - 1)),
        node_fixed=jnp.zeros(N, bool),
        c_submap=jnp.asarray(np.pad(cs, (0, pad)).astype(np.int32)),
        c_node=jnp.asarray(np.pad(cn, (0, pad)).astype(np.int32)),
        c_mask=jnp.asarray(np.pad(np.ones(Ca, bool), (0, pad))),
        c_rel_pose=jnp.asarray(np.pad(np.asarray(crel, np.float32), ((0, pad), (0, 0)))),
        c_translation_weight=jnp.asarray(np.pad(np.full(Ca, 20.0), (0, pad)).astype(np.float32)),
        c_rotation_weight=jnp.asarray(np.pad(np.full(Ca, 20.0), (0, pad)).astype(np.float32)),
        c_huber_scale=jnp.asarray(np.full(C, 1e6, np.float32)),
    ), gt_sub, gt_node


def test_sharded_spa_matches_local():
    rng = np.random.default_rng(0)
    problem, gt_sub, gt_node = build_problem(rng)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("graph",))
    sub_s, node_s, cost_s = solve_spa_2d_sharded(problem, mesh, num_iterations=20)
    sub_l, node_l, cost_l = solve_spa_2d(problem, num_iterations=20)

    # Both converge to the ground truth (gauge anchored at submap 0).
    np.testing.assert_allclose(np.asarray(node_s)[:, :2], gt_node[:, :2], atol=0.02)
    np.testing.assert_allclose(np.asarray(node_l)[:, :2], gt_node[:, :2], atol=0.02)
    # And agree with each other tightly.
    np.testing.assert_allclose(np.asarray(node_s), np.asarray(node_l), atol=1e-3)


def test_sharded_spa_single_device_mesh():
    rng = np.random.default_rng(1)
    problem, gt_sub, gt_node = build_problem(rng)
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("graph",))
    sub_s, node_s, _ = solve_spa_2d_sharded(problem, mesh, num_iterations=20)
    np.testing.assert_allclose(np.asarray(node_s)[:, :2], gt_node[:, :2], atol=0.02)
