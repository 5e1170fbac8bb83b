"""Evaluation metric tests
(ref: ground_truth/compute_relations_metrics_main.cc behavior)."""

import numpy as np

from hectorgrapher_tpu.evaluation.metrics import (
    Relation,
    TrajectoryInterpolator,
    ate_rmse,
    compute_relation_metrics,
    relations_from_ground_truth,
)
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def line_trajectory(n=20, speed=0.5, dt=0.1, offset=np.zeros(3)):
    times = [i * dt for i in range(n)]
    poses = [NpRigid3(np.array([speed * t, 0.0, 0.0]) + offset, nq.quat_identity()) for t in times]
    return times, poses


def test_perfect_trajectory_zero_error():
    times, poses = line_trajectory()
    relations = relations_from_ground_truth(times, poses, 0.2)
    assert len(relations) > 5
    m = compute_relation_metrics(TrajectoryInterpolator(times, poses), relations)
    assert m.abs_translational_error_mean < 1e-9
    assert m.abs_rotational_error_deg_mean < 1e-6


def test_biased_trajectory_detected():
    times, gt_poses = line_trajectory()
    # Estimated trajectory runs 10% slow.
    est_poses = [NpRigid3(p.t * 0.9, p.q) for p in gt_poses]
    relations = relations_from_ground_truth(times, gt_poses, 0.2)
    m = compute_relation_metrics(TrajectoryInterpolator(times, est_poses), relations)
    np.testing.assert_allclose(m.abs_translational_error_mean, 0.01, atol=1e-6)


def test_ate_rmse_alignment_removes_offset():
    times, gt_poses = line_trajectory()
    est_poses = [NpRigid3(p.t + np.array([5.0, -3.0, 1.0]), p.q) for p in gt_poses]
    # With alignment, a constant offset vanishes.
    assert ate_rmse(times, est_poses, times, gt_poses, align=True) < 1e-6
    assert ate_rmse(times, est_poses, times, gt_poses, align=False) > 5.0


def test_ate_rmse_noise():
    rng = np.random.default_rng(0)
    times, gt_poses = line_trajectory(n=50)
    est_poses = [NpRigid3(p.t + rng.normal(0, 0.05, 3), p.q) for p in gt_poses]
    rmse = ate_rmse(times, est_poses, times, gt_poses)
    assert 0.03 < rmse < 0.15
