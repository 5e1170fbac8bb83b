"""SPA solver tests
(ref: spa_cost_function_2d_test.cc + optimization_problem tests: a noisy
loop of poses with loop-closure constraints must straighten out)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.pose_graph.optimization import (
    SpaProblem2D,
    SpaProblem3D,
    solve_spa_2d,
    solve_spa_3d,
)
from hectorgrapher_tpu.transform import np_quat as nq


def test_spa_2d_square_loop():
    """4 submap-less... rather: nodes around a square, odometry constraints
    with drift, one loop closure pins the end to the start."""
    S, N, C = 4, 8, 32
    rng = np.random.default_rng(0)

    # Ground truth: nodes on a square of side 2, 2 nodes per side.
    gt = []
    for i in range(8):
        side = i // 2
        frac = (i % 2) / 2.0
        if side == 0:
            gt.append([2 * frac, 0.0, 0.0])
        elif side == 1:
            gt.append([2.0, 2 * frac, np.pi / 2])
        elif side == 2:
            gt.append([2.0 - 2 * frac, 2.0, np.pi])
        else:
            gt.append([0.0, 2.0 - 2 * frac, -np.pi / 2])
    gt = np.asarray(gt, np.float32)

    # Submaps: one per side at the first node of the side.
    submap_gt = gt[::2].copy()

    # Initial values: drifted.
    drift = np.cumsum(rng.normal(0, 0.05, size=(8, 3)), axis=0).astype(np.float32)
    node_init = gt + drift
    submap_init = submap_gt + drift[::2]
    # Gauge anchor: submap 0 is held fixed, so it must start at truth.
    submap_init[0] = submap_gt[0]

    submap_pose = np.zeros((S, 3), np.float32)
    submap_pose[:4] = submap_init
    node_pose = np.zeros((N, 3), np.float32)
    node_pose[:8] = node_init

    # Constraints: each node to its side's submap with ground-truth
    # relative pose (INTRA), plus node 0 to submap of side 3 (loop).
    cs, cn, cm, crel, cwt, cwr, chub = [], [], [], [], [], [], []

    def rel_pose(sub, node):
        c, s = np.cos(sub[2]), np.sin(sub[2])
        d = node[:2] - sub[:2]
        return [c * d[0] + s * d[1], -s * d[0] + c * d[1], node[2] - sub[2]]

    for i in range(8):
        si = i // 2
        cs.append(si); cn.append(i); cm.append(True)
        crel.append(rel_pose(submap_gt[si], gt[i]))
        cwt.append(30.0); cwr.append(30.0); chub.append(1e6)
    # inter-submap links via shared nodes: node at side boundary
    for i in range(8):
        si = ((i + 1) // 2) % 4  # also constrain to the next submap
        cs.append(si); cn.append(i); cm.append(True)
        crel.append(rel_pose(submap_gt[si], gt[i]))
        cwt.append(30.0); cwr.append(30.0); chub.append(1e6)

    C_actual = len(cs)
    pad = C - C_actual
    problem = SpaProblem2D(
        submap_pose=jnp.asarray(submap_pose),
        node_pose=jnp.asarray(node_pose),
        submap_fixed=jnp.asarray([True, False, False, False]),
        node_fixed=jnp.zeros(N, bool),
        c_submap=jnp.asarray(np.pad(cs, (0, pad)).astype(np.int32)),
        c_node=jnp.asarray(np.pad(cn, (0, pad)).astype(np.int32)),
        c_mask=jnp.asarray(np.pad(cm, (0, pad))),
        c_rel_pose=jnp.asarray(np.pad(np.asarray(crel, np.float32), ((0, pad), (0, 0)))),
        c_translation_weight=jnp.asarray(np.pad(cwt, (0, pad)).astype(np.float32)),
        c_rotation_weight=jnp.asarray(np.pad(cwr, (0, pad)).astype(np.float32)),
        c_huber_scale=jnp.asarray(np.pad(chub, (0, pad), constant_values=1e6).astype(np.float32)),
    )
    sub_out, node_out, cost = solve_spa_2d(problem, num_iterations=25)
    sub_out = np.asarray(sub_out)
    node_out = np.asarray(node_out)
    # The gauge is fixed by submap 0; everything should return to gt.
    np.testing.assert_allclose(node_out[:8, :2], gt[:, :2], atol=0.02)
    err_angles = (node_out[:8, 2] - gt[:, 2] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(err_angles, 0.0, atol=0.02)
    assert float(cost) < 1e-3


def test_spa_3d_chain_with_loop():
    S, N, C = 3, 6, 16
    rng = np.random.default_rng(1)
    # Nodes along x, one submap per pair.
    gt_t = np.array([[i * 0.5, 0, 0] for i in range(6)], np.float32)
    sub_gt_t = gt_t[::2].copy()
    drift = np.cumsum(rng.normal(0, 0.04, size=(6, 3)), axis=0).astype(np.float32)

    node_t = gt_t + drift
    sub_t = sub_gt_t + drift[::2]
    sub_t[0] = sub_gt_t[0]  # gauge anchor at truth
    qI = np.tile(np.array([1, 0, 0, 0], np.float32), (6, 1))

    cs, cn, crel_t = [], [], []
    for i in range(6):
        cs.append(i // 2); cn.append(i)
        crel_t.append(gt_t[i] - sub_gt_t[i // 2])
    for i in range(6):
        si = min(2, (i + 1) // 2)
        cs.append(si); cn.append(i)
        crel_t.append(gt_t[i] - sub_gt_t[si])
    Ca = len(cs)
    pad = C - Ca
    problem = SpaProblem3D(
        submap_translation=jnp.asarray(sub_t),
        submap_rotation=jnp.asarray(qI[:3]),
        node_translation=jnp.asarray(node_t),
        node_rotation=jnp.asarray(qI),
        submap_fixed=jnp.asarray([True, False, False]),
        node_fixed=jnp.zeros(6, bool),
        c_submap=jnp.asarray(np.pad(cs, (0, pad)).astype(np.int32)),
        c_node=jnp.asarray(np.pad(cn, (0, pad)).astype(np.int32)),
        c_mask=jnp.asarray(np.pad(np.ones(Ca, bool), (0, pad))),
        c_rel_translation=jnp.asarray(np.pad(np.asarray(crel_t, np.float32), ((0, pad), (0, 0)))),
        c_rel_rotation=jnp.asarray(np.tile(np.array([1, 0, 0, 0], np.float32), (C, 1))),
        c_translation_weight=jnp.asarray(np.pad(np.full(Ca, 20.0), (0, pad)).astype(np.float32)),
        c_rotation_weight=jnp.asarray(np.pad(np.full(Ca, 20.0), (0, pad)).astype(np.float32)),
        c_huber_scale=jnp.asarray(np.full(C, 1e6, np.float32)),
    )
    st, sq, nt, nqr, cost = solve_spa_3d(problem, num_iterations=25)
    nt = np.asarray(nt)
    np.testing.assert_allclose(nt, gt_t, atol=0.02)
    assert float(cost) < 1e-3
