"""CT window solver tests: perturb control points, assert recovery
(ref: the reference has no direct unit test for the CT solve; this mirrors
ceres_scan_matcher_3d_test.cc's perturb-and-recover pattern at the window
level)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.common.config import TSDFRangeDataInserterOptions3D
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.ct.window_solver import (
    CtProblem,
    CtState,
    CtWeights,
    solve_ct_window,
)
from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.transform import np_quat as nq


def build_box_tsdf(resolution=0.1, size=128):
    grid = make_tsdf_grid(resolution, (size, size, 64), truncation_distance=0.3, max_weight=1000.0)
    opts = TSDFRangeDataInserterOptions3D(normal_computation_method="NONE", min_range=0.4, max_range=30.0)
    insert = make_tsdf_inserter_3d(opts, resolution)
    for pose_t in [np.zeros(3), np.array([0.3, 0.0, 0.0]), np.array([-0.3, 0.2, 0.0])]:
        pts = raycast_box_room_3d(pose_t, nq.quat_identity(), num_azimuth=128, num_elevation=32)
        valid = ~np.isnan(pts[:, 0])
        world = pts[valid] + pose_t
        rd = RangeData(
            origin=jnp.asarray(pose_t, jnp.float32),
            returns=pad_cloud(world.astype(np.float32), 4096),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 4),
        )
        grid = insert(grid, rd)
    return grid


def make_problem(K, C, P, cp_data, clouds):
    """cp_data: list of (t, q, v) numpy; clouds: list of (prev, next, factor, pts)."""
    k = len(cp_data)
    cp_mask = np.zeros(K, bool); cp_mask[:k] = True
    trans = np.zeros((K, 3), np.float32)
    rot = np.tile(np.array([1, 0, 0, 0], np.float32), (K, 1))
    vel = np.zeros((K, 3), np.float32)
    for i, (t, q, v) in enumerate(cp_data):
        trans[i], rot[i], vel[i] = t, q, v
    cloud_mask = np.zeros(C, bool)
    prev = np.zeros(C, np.int32); nxt = np.zeros(C, np.int32); fac = np.zeros(C, np.float32)
    hi = np.zeros((C, P, 3), np.float32); him = np.zeros((C, P), bool)
    for ci, (p, n, f, pts) in enumerate(clouds):
        cloud_mask[ci] = True
        prev[ci], nxt[ci], fac[ci] = p, n, f
        m = min(len(pts), P)
        hi[ci, :m] = pts[:m]
        him[ci, :m] = True
    z3 = np.zeros((K - 1, 3), np.float32)
    qI = np.tile(np.array([1, 0, 0, 0], np.float32), (K - 1, 1))
    problem = CtProblem(
        cp_mask=jnp.asarray(cp_mask),
        cp_times=jnp.asarray(np.arange(K, dtype=np.float32) * 0.1),
        cloud_mask=jnp.asarray(cloud_mask),
        cloud_prev=jnp.asarray(prev),
        cloud_next=jnp.asarray(nxt),
        cloud_factor=jnp.asarray(fac),
        cloud_time=jnp.asarray(fac * 0.1),
        hi_points=jnp.asarray(hi),
        hi_mask=jnp.asarray(him),
        hi_times=jnp.zeros((C, P), jnp.float32),
        lo_points=jnp.asarray(hi),
        lo_mask=jnp.asarray(him),
        lo_times=jnp.zeros((C, P), jnp.float32),
        pair_mask=jnp.asarray(np.zeros(K - 1, bool)),
        pair_dt=jnp.asarray(np.full(K - 1, 0.1, np.float32)),
        imu_delta_rotation=jnp.asarray(qI),
        imu_delta_velocity=jnp.asarray(z3),
        imu_delta_translation=jnp.asarray(z3),
        odom_mask=jnp.asarray(np.zeros(K - 1, bool)),
        odom_delta_translation=jnp.asarray(z3),
        odom_delta_rotation=jnp.asarray(qI),
        odom_translation_weight=jnp.asarray(np.zeros(K - 1, np.float32)),
        odom_rotation_weight=jnp.asarray(np.zeros(K - 1, np.float32)),
    )
    state = CtState(jnp.asarray(trans), jnp.asarray(rot), jnp.asarray(vel))
    return problem, state


class TestCtWindowSolver:
    def test_recovers_translation_perturbation(self):
        grid = build_box_tsdf()
        K, C, P = 4, 2, 1024
        rng = np.random.default_rng(0)
        # Ground truth: static at origin. Scan taken at origin.
        pts = raycast_box_room_3d(np.zeros(3), nq.quat_identity(), num_azimuth=96, num_elevation=24)
        pts = pts[~np.isnan(pts[:, 0])]
        sel = rng.choice(len(pts), size=min(1024, len(pts)), replace=False)
        pts = pts[sel]

        # CP0 fixed at truth; CP1 perturbed; cloud at factor 1.0 (=CP1).
        cp_data = [
            (np.zeros(3), nq.quat_identity(), np.zeros(3)),
            (np.array([0.15, -0.1, 0.05]), nq.quat_from_axis_angle(np.array([0.0, 0.0, 0.04])), np.zeros(3)),
        ]
        clouds = [(0, 1, 1.0, pts)]
        problem, state = make_problem(K, C, P, cp_data, clouds)
        weights = CtWeights(*(jnp.asarray(w, jnp.float32) for w in (1.0, 1.0, 0.0, 0.0, 0.0)))
        solved, final_cost, initial_cost = solve_ct_window(
            grid, grid, problem, state, weights, is_tsdf=True, num_iterations=25
        )
        assert float(final_cost) < float(initial_cost)
        t1 = np.asarray(solved.translation)[1]
        np.testing.assert_allclose(t1, [0.0, 0.0, 0.0], atol=0.05)
        aa = nq.quat_to_axis_angle(np.asarray(solved.rotation)[1].astype(np.float64))
        assert abs(aa[2]) < 0.03  # reduced from initial 0.04 perturbation

    def test_recovers_perturbation_per_point(self):
        """Per-point unwarping mode must also recover a perturbed control
        point — end-to-end exercise of the split analytic Jacobian
        (rotation-only jacfwd + closed-form translation columns)."""
        grid = build_box_tsdf()
        K, C, P = 4, 2, 1024
        rng = np.random.default_rng(1)
        pts = raycast_box_room_3d(np.zeros(3), nq.quat_identity(), num_azimuth=96, num_elevation=24)
        pts = pts[~np.isnan(pts[:, 0])]
        sel = rng.choice(len(pts), size=min(1024, len(pts)), replace=False)
        pts = pts[sel]
        cp_data = [
            (np.zeros(3), nq.quat_identity(), np.zeros(3)),
            (np.array([0.15, -0.1, 0.05]), nq.quat_from_axis_angle(np.array([0.0, 0.0, 0.04])), np.zeros(3)),
        ]
        clouds = [(0, 1, 1.0, pts)]
        problem, state = make_problem(K, C, P, cp_data, clouds)
        # Spread per-point times across the bracket so points interpolate
        # at varied factors (truth is static, so world points are
        # time-invariant but the Jacobian path sees varied brackets).
        times = np.zeros((C, P), np.float32)
        times[0] = np.linspace(0.0, 0.1, P)
        problem = problem._replace(
            hi_times=jnp.asarray(times), lo_times=jnp.asarray(times)
        )
        weights = CtWeights(*(jnp.asarray(w, jnp.float32) for w in (1.0, 1.0, 0.0, 0.0, 0.0)))
        solved, final_cost, initial_cost = solve_ct_window(
            grid, grid, problem, state, weights, is_tsdf=True,
            num_iterations=25, per_point=True,
        )
        assert float(final_cost) < float(initial_cost)
        t1 = np.asarray(solved.translation)[1]
        np.testing.assert_allclose(t1, [0.0, 0.0, 0.0], atol=0.06)
        aa = nq.quat_to_axis_angle(np.asarray(solved.rotation)[1].astype(np.float64))
        assert abs(aa[2]) < 0.03

    def test_imu_and_odometry_constrain_unobserved(self):
        """A control point with no scan data must follow the odometry."""
        grid = build_box_tsdf()
        K, C, P = 4, 2, 256
        cp_data = [
            (np.zeros(3), nq.quat_identity(), np.array([1.0, 0.0, 0.0])),
            (np.array([0.3, 0.2, 0.0]), nq.quat_identity(), np.array([1.0, 0.0, 0.0])),
        ]
        problem, state = make_problem(K, C, P, cp_data, [])
        # odometry says CP0 -> CP1 moved +0.1 x
        odom_mask = np.zeros(K - 1, bool); odom_mask[0] = True
        odom_dt = np.zeros((K - 1, 3), np.float32); odom_dt[0] = [0.1, 0.0, 0.0]
        problem = problem._replace(
            odom_mask=jnp.asarray(odom_mask),
            odom_delta_translation=jnp.asarray(odom_dt),
            odom_translation_weight=jnp.asarray(np.full(K - 1, 10.0, np.float32)),
            odom_rotation_weight=jnp.asarray(np.full(K - 1, 10.0, np.float32)),
        )
        weights = CtWeights(*(jnp.asarray(w, jnp.float32) for w in (0.0, 0.0, 0.0, 0.0, 0.0)))
        solved, final_cost, _ = solve_ct_window(
            grid, grid, problem, state, weights, is_tsdf=True, num_iterations=15
        )
        t1 = np.asarray(solved.translation)[1]
        np.testing.assert_allclose(t1, [0.1, 0.0, 0.0], atol=0.01)


def test_block_solver_cost_matches_dense_residual():
    """The block families' assembled cost must equal the straightforward
    dense residual stack (make_ct_residual) — the golden reference for the
    analytic-Jacobian/block-assembly rewrite, in both bracketing modes."""
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_ct_example
    from hectorgrapher_tpu.mapping.ct import window_solver as ws

    hi, lo, problem, state, weights = _build_ct_example(grid=32)
    # Spread per-point times so per-point mode brackets differently.
    problem = problem._replace(
        hi_times=jnp.linspace(-0.09, 0.0, problem.hi_times.shape[1], dtype=jnp.float32)[
            None, :
        ].repeat(problem.hi_times.shape[0], 0),
        lo_times=jnp.linspace(-0.09, 0.0, problem.lo_times.shape[1], dtype=jnp.float32)[
            None, :
        ].repeat(problem.lo_times.shape[0], 0),
    )
    for per_point in (False, True):
        dense = ws.make_ct_residual(hi, lo, problem, weights, True, per_point=per_point)
        r = dense(state)
        dense_cost = float(0.5 * jnp.sum(r * r))
        _, _, initial_cost = ws.solve_ct_window(
            hi, lo, problem, state, weights, is_tsdf=True, num_iterations=1,
            per_point=per_point,
        )
        np.testing.assert_allclose(float(initial_cost), dense_cost, rtol=2e-3)


def test_block_normal_equations_match_dense_jacfwd():
    """The analytic split Jacobians (rotation-only jacfwd + closed-form
    translation/velocity columns, window_solver.make_ct_block_families)
    must assemble the SAME normal equations as jacfwd of the dense
    residual stack — guards the hand-derived columns in both bracketing
    modes (advisor round-4 finding: J itself was never exercised)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_ct_example
    from hectorgrapher_tpu.mapping.ct import window_solver as ws

    hi, lo, problem, state, weights = _build_ct_example(grid=32)
    problem = problem._replace(
        hi_times=jnp.linspace(-0.09, 0.0, problem.hi_times.shape[1], dtype=jnp.float32)[
            None, :
        ].repeat(problem.hi_times.shape[0], 0),
        lo_times=jnp.linspace(-0.09, 0.0, problem.lo_times.shape[1], dtype=jnp.float32)[
            None, :
        ].repeat(problem.lo_times.shape[0], 0),
    )
    D = 9 * state.translation.shape[0]
    for per_point in (False, True):
        JtJ, g, cost = ws.ct_normal_equations(
            hi, lo, problem, state, weights, True, per_point=per_point
        )
        dense = ws.make_ct_residual(hi, lo, problem, weights, True, per_point=per_point)
        resid = lambda d: dense(ws.ct_retract(state, d))
        J = jax.jacfwd(resid)(jnp.zeros(D, jnp.float32))
        r = resid(jnp.zeros(D, jnp.float32))
        JtJ_ref = np.asarray(J).T @ np.asarray(J)
        g_ref = np.asarray(J).T @ np.asarray(r)
        # Tolerance: the analytic path and AD-of-dense differ by design in
        # how the pose chain is linearized (slerp/normalize formulation);
        # measured deviation is ~0.22% of the max entry in BOTH modes (the
        # per-scan mode is the long-trusted baseline). A real regression in
        # the hand-derived columns produces O(10%+) errors.
        scale = max(float(np.abs(JtJ_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(JtJ), JtJ_ref, atol=1e-2 * scale)
        gscale = max(float(np.abs(g_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=5e-3 * gscale)
        np.testing.assert_allclose(
            float(cost), float(0.5 * jnp.sum(r * r)), rtol=2e-3
        )
