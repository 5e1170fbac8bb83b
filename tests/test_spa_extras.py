"""Extended 3D SPA tests: node-node / fixed-frame / landmark residuals
(ref: optimization_problem_3d.cc odometry/fixed-frame/landmark residuals,
landmark_cost_function_3d_test.cc)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.pose_graph.optimization import (
    SpaProblem3D,
    SpaExtras3D,
    empty_extras_3d,
    solve_spa_3d_full,
)

QI = np.array([1, 0, 0, 0], np.float32)


def base_problem(S, N, C, sub_t, node_t, cs, cn, crel, w=20.0):
    pad = C - len(cs)
    qC = np.tile(QI, (C, 1))
    return SpaProblem3D(
        submap_translation=jnp.asarray(sub_t),
        submap_rotation=jnp.asarray(np.tile(QI, (S, 1))),
        node_translation=jnp.asarray(node_t),
        node_rotation=jnp.asarray(np.tile(QI, (N, 1))),
        submap_fixed=jnp.asarray([True] + [False] * (S - 1)),
        node_fixed=jnp.zeros(N, bool),
        c_submap=jnp.asarray(np.pad(cs, (0, pad)).astype(np.int32)),
        c_node=jnp.asarray(np.pad(cn, (0, pad)).astype(np.int32)),
        c_mask=jnp.asarray(np.pad(np.ones(len(cs), bool), (0, pad))),
        c_rel_translation=jnp.asarray(np.pad(np.asarray(crel, np.float32), ((0, pad), (0, 0)))),
        c_rel_rotation=jnp.asarray(qC),
        c_translation_weight=jnp.asarray(np.pad(np.full(len(cs), w), (0, pad)).astype(np.float32)),
        c_rotation_weight=jnp.asarray(np.pad(np.full(len(cs), w), (0, pad)).astype(np.float32)),
        c_huber_scale=jnp.asarray(np.full(C, 1e6, np.float32)),
    )


def test_node_node_odometry_constrains_chain():
    """Nodes constrained only by odometry (node-node); one submap anchors."""
    S, N, C = 1, 5, 8
    rng = np.random.default_rng(0)
    gt = np.array([[0.2 * i, 0, 0] for i in range(N)], np.float32)
    node_t = gt + np.concatenate([[np.zeros(3)], rng.normal(0, 0.1, (N - 1, 3))]).astype(np.float32)
    # Only node 0 is tied to the fixed submap.
    problem = base_problem(S, N, C, np.zeros((S, 3), np.float32), node_t, [0], [0], [[0, 0, 0]])
    P = 8
    extras = empty_extras_3d(N, p=P)
    nn_a = np.zeros(P, np.int32)
    nn_b = np.zeros(P, np.int32)
    nn_rel = np.zeros((P, 3), np.float32)
    nn_mask = np.zeros(P, bool)
    for i in range(N - 1):
        nn_a[i], nn_b[i] = i, i + 1
        nn_rel[i] = [0.2, 0, 0]
        nn_mask[i] = True
    extras = extras._replace(
        nn_a=jnp.asarray(nn_a),
        nn_b=jnp.asarray(nn_b),
        nn_mask=jnp.asarray(nn_mask),
        nn_rel_translation=jnp.asarray(nn_rel),
        nn_translation_weight=jnp.full(P, 10.0, jnp.float32),
        nn_rotation_weight=jnp.full(P, 10.0, jnp.float32),
    )
    st, sq, nt, nq, lt, lq, cq, grav, cost = solve_spa_3d_full(problem, extras, num_iterations=25)
    np.testing.assert_allclose(np.asarray(nt), gt, atol=0.02)


def test_fixed_frame_pulls_to_gps():
    S, N, C = 1, 4, 8
    gt = np.array([[0.5 * i, 0.2, 0] for i in range(N)], np.float32)
    node_t = np.zeros((N, 3), np.float32)
    # no submap-node constraints beyond a weak anchor on node 0
    problem = base_problem(S, N, C, np.zeros((S, 3), np.float32), node_t, [0], [0], [[0, 0.2, 0]], w=1.0)
    extras = empty_extras_3d(N)
    extras = extras._replace(
        ff_mask=jnp.ones(N, bool),
        ff_translation=jnp.asarray(gt),
        ff_translation_weight=jnp.full(N, 50.0, jnp.float32),
    )
    st, sq, nt, nq, lt, lq, cq, grav, cost = solve_spa_3d_full(problem, extras, num_iterations=20)
    np.testing.assert_allclose(np.asarray(nt), gt, atol=0.02)


def test_landmark_observations_locate_landmark():
    """Two nodes observe one landmark; the landmark pose is solved."""
    S, N, C = 1, 2, 4
    node_gt = np.array([[0, 0, 0], [1.0, 0, 0]], np.float32)
    lm_gt = np.array([0.5, 1.0, 0.3], np.float32)
    problem = base_problem(
        S, N, C, np.zeros((S, 3), np.float32), node_gt,
        [0, 0], [0, 1], [node_gt[0].tolist(), node_gt[1].tolist()], w=100.0,
    )
    O = 4
    extras = empty_extras_3d(N, l=2, o=O)
    lm_node = np.zeros(O, np.int32)
    lm_index = np.zeros(O, np.int32)
    lm_rel = np.zeros((O, 3), np.float32)
    lm_mask = np.zeros(O, bool)
    for i in range(2):
        lm_node[i] = i
        lm_index[i] = 0
        lm_rel[i] = lm_gt - node_gt[i]  # identity rotations
        lm_mask[i] = True
    extras = extras._replace(
        landmark_translation=jnp.asarray(np.zeros((2, 3), np.float32)),
        landmark_mask=jnp.asarray([True, False]),
        lm_node=jnp.asarray(lm_node),
        lm_index=jnp.asarray(lm_index),
        lm_mask=jnp.asarray(lm_mask),
        lm_rel_translation=jnp.asarray(lm_rel),
        lm_translation_weight=jnp.full(O, 10.0, jnp.float32),
        lm_rotation_weight=jnp.full(O, 10.0, jnp.float32),
    )
    st, sq, nt, nq, lt, lq, cq, grav, cost = solve_spa_3d_full(problem, extras, num_iterations=25)
    np.testing.assert_allclose(np.asarray(lt)[0], lm_gt, atol=0.02)
    np.testing.assert_allclose(np.asarray(nt), node_gt, atol=0.02)


def test_imu_rotation_residuals_constrain_orientation():
    """Consecutive-node rotation residuals vs gyro deltas (identity
    calibration) pull drifted orientations back."""
    from hectorgrapher_tpu.transform import np_quat as nq2

    S, N, C = 1, 4, 8
    gt_t = np.array([[0.3 * i, 0, 0] for i in range(N)], np.float32)
    # Ground truth: yaw increases 0.1 rad per step (gyro measures it).
    gt_q = np.stack([nq2.quat_from_axis_angle(np.array([0, 0, 0.1 * i])) for i in range(N)]).astype(np.float32)
    # Initial: correct translations, drifted rotations (except node 0 via anchor)
    rng = np.random.default_rng(0)
    init_q = gt_q.copy()
    for i in range(1, N):
        init_q[i] = nq2.quat_multiply(
            gt_q[i], nq2.quat_from_axis_angle(rng.normal(0, 0.05, 3))
        ).astype(np.float32)

    problem = base_problem(S, N, C, np.zeros((S, 3), np.float32), gt_t, [0], [0], [[0, 0, 0]], w=100.0)
    problem = problem._replace(node_rotation=jnp.asarray(init_q))
    R = 4
    extras = empty_extras_3d(N, r=R)
    ir_a = np.zeros(R, np.int32); ir_b = np.zeros(R, np.int32)
    ir_mask = np.zeros(R, bool)
    ir_dq = np.tile(np.array([1, 0, 0, 0], np.float32), (R, 1))
    for i in range(N - 1):
        ir_a[i], ir_b[i], ir_mask[i] = i, i + 1, True
        # gyro delta: rotation from node i to i+1 in IMU(=tracking) frame
        rel = nq2.quat_multiply(nq2.quat_conjugate(gt_q[i]), gt_q[i + 1])
        ir_dq[i] = rel
    extras = extras._replace(
        ir_a=jnp.asarray(ir_a), ir_b=jnp.asarray(ir_b), ir_mask=jnp.asarray(ir_mask),
        ir_delta_rotation=jnp.asarray(ir_dq),
        ir_weight=jnp.full(R, 50.0, jnp.float32),
        traj_mask=jnp.asarray([True]),
        calibration_fixed=jnp.asarray(True),
    )
    # anchor node 0 rotation via a strong INTRA constraint already present
    st, sq, nt, nqr, lt, lq, cq, grav, cost = solve_spa_3d_full(problem, extras, num_iterations=30)
    nqr = np.asarray(nqr)
    for i in range(N):
        dot = abs(float(np.sum(nqr[i] * gt_q[i])))
        assert dot > 0.9995, f"node {i} rotation error: dot {dot}"


def test_set_landmark_pose_seeds_solve_then_yields_to_estimate():
    """set_landmark_pose seeds the next optimization (lm_init override)
    and is consumed by it: afterwards landmark_poses() returns the
    OPTIMIZED estimate, not the stale client pose (ref: pose_graph
    SetLandmarkPose semantics; code-review r2 finding)."""
    import numpy as np

    from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
    from hectorgrapher_tpu.mapping.map_builder import MapBuilder
    from hectorgrapher_tpu.transform import np_quat as nq
    from hectorgrapher_tpu.transform.np_quat import NpRigid3

    options = replace_deep(
        MapBuilderOptions(),
        {
            "use_trajectory_builder_2d": True,
            "pose_graph.optimize_every_n_nodes": 0,
        },
    )
    mb = MapBuilder(options)
    pg = mb.pose_graph
    pg.register_trajectory(0)
    # Hand-build two nodes + a landmark observed from both.
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode

    for i in range(2):
        node = PgNode(
            time=float(i),
            local_pose=NpRigid3(np.array([i * 1.0, 0, 0])),
            global_pose=NpRigid3(np.array([i * 1.0, 0, 0])),
            trajectory_id=0,
            node_id=i,
        )
        pg.nodes.append(node)
        pg._node_index_by_id[i] = i
        pg.add_landmark_data(
            0, float(i), "lm", NpRigid3(np.array([0.5, 1.0 - i * 1.0, 0.0])), 10.0, 10.0
        )
    # Minimal graph so the optimization actually runs: one submap + INTRA
    # constraints anchoring both nodes.
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import Constraint, PgSubmap

    class _FakeSubmap:
        local_pose = NpRigid3(np.zeros(3))
        num_range_data = 2
        insertion_finished = False

    pg.submaps.append(
        PgSubmap(submap=_FakeSubmap(), global_pose=NpRigid3(np.zeros(3)), trajectory_id=0, submap_id=0)
    )
    pg._submap_index_by_id[0] = 0
    for i in range(2):
        pg.constraints.append(
            Constraint(
                submap_index=0,
                node_index=i,
                zbar=NpRigid3(np.array([i * 1.0, 0, 0])),
                translation_weight=100.0,
                rotation_weight=100.0,
                tag="INTRA",
            )
        )
    # Client seed far from the observations' implied position (~(0.5, 1)).
    pg.set_landmark_pose("lm", NpRigid3(np.array([100.0, 100.0, 0.0])))
    assert np.allclose(pg.landmark_poses()["lm"].t[:2], [100.0, 100.0])
    pg.run_final_optimization()
    lm = pg.landmark_poses()["lm"]
    # Override consumed: the estimate reflects the observations again.
    assert np.linalg.norm(lm.t[:2] - np.array([0.5, 1.0])) < 1.0, lm.t
