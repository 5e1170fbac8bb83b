"""End-to-end continuous-time 3D local SLAM test
(ref: map_builder_test.cc LocalSlam3D pattern: drive a synthetic
trajectory with IMU + odometry, assert bounded pose error)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.common.config import TrajectoryBuilder3DOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.ct.builder import OptimizingLocalTrajectoryBuilder
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

GRAVITY = np.array([0.0, 0.0, 9.80665])


def make_options():
    return replace_deep(
        TrajectoryBuilder3DOptions(),
        {
            "min_range": 0.4,
            "max_range": 25.0,
            "submaps.grid_type": "TSDF",
            "submaps.high_grid_size": 96,
            "submaps.low_grid_size": 48,
            "submaps.high_resolution": 0.1,
            "submaps.low_resolution": 0.45,
            "motion_filter.max_distance_meters": 0.02,
            "motion_filter.max_angle_radians": 0.002,
            "motion_filter.max_time_seconds": 0.05,
            "optimizing_local_trajectory_builder.initialization_duration": 0.45,
            "optimizing_local_trajectory_builder.max_control_points": 12,
            "optimizing_local_trajectory_builder.max_clouds_in_window": 12,
            "optimizing_local_trajectory_builder.points_per_cloud": 256,
            "optimizing_local_trajectory_builder.max_num_iterations": 8,
            "high_resolution_adaptive_voxel_filter.min_num_points": 150,
            "low_resolution_adaptive_voxel_filter.min_num_points": 200,
        },
    )


def gt_pose(t, speed=0.2, yaw_rate=0.0):
    yaw = yaw_rate * t
    return np.array([speed * t, 0.0, 0.0]), nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))


def drive_ct(builder, duration=3.0, speed=0.2, yaw_rate=0.0, odom_noise=0.0, scan_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    results = []
    dt_imu, dt_odom, dt_scan = 0.01, 0.05, 0.1
    t = 0.0
    next_odom, next_scan = 0.0, 0.05  # scans offset from odom ticks
    while t <= duration:
        # IMU: gravity in body frame + gyro.
        _, q = gt_pose(t, speed, yaw_rate)
        acc_body = nq.quat_rotate(nq.quat_conjugate(q), GRAVITY)
        gyro_body = np.array([0.0, 0.0, yaw_rate])
        builder.add_imu_data(t, acc_body, gyro_body)
        if t >= next_odom:
            pt, pq = gt_pose(t, speed, yaw_rate)
            noise = rng.normal(0, odom_noise, 3) if odom_noise else np.zeros(3)
            builder.add_odometry_data(t, NpRigid3(pt + noise, pq))
            next_odom += dt_odom
        if t >= next_scan:
            pt, pq = gt_pose(t, speed, yaw_rate)
            pts = raycast_box_room_3d(
                pt, pq, num_azimuth=96, num_elevation=24,
                noise_std=scan_noise, rng=rng if scan_noise else None,
            )
            valid = ~np.isnan(pts[:, 0])
            pts = pts[valid]
            cloud = pad_timed_cloud(pts, np.zeros(len(pts), np.float32), 2560)
            res = builder.add_range_data(
                TimedPointCloudData(
                    time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud, width=96
                )
            )
            if res is not None:
                results.append(res)
            next_scan += dt_scan
        t = round(t + dt_imu, 6)
    return results


class TestOptimizingLocalTrajectoryBuilder:
    def test_straight_drive_tracks_pose(self):
        builder = OptimizingLocalTrajectoryBuilder(make_options())
        results = drive_ct(builder, duration=3.0, speed=0.2, odom_noise=0.002, seed=0)
        assert len(results) >= 5, "expected matching results after initialization"
        # Every result pose should be near ground truth at its time.
        errs = []
        for r in results[2:]:
            gt_t, _ = gt_pose(r.time)
            errs.append(np.linalg.norm(r.local_pose.t - gt_t))
        max_err = max(errs)
        assert max_err < 0.15, f"max pose error {max_err}; errors {errs}"

    def test_builds_submaps(self):
        builder = OptimizingLocalTrajectoryBuilder(make_options())
        results = drive_ct(builder, duration=2.0, speed=0.2)
        submaps = builder.active_submaps.submaps
        assert len(submaps) >= 1
        assert submaps[0].num_range_data >= 3
        # TSDF should have observed cells.
        w = np.asarray(submaps[0].high_resolution_grid.weight)
        assert (w > 0).sum() > 1000
        # histogram accumulated
        assert submaps[0].rotational_histogram.sum() > 0

    def test_turn_in_place(self):
        builder = OptimizingLocalTrajectoryBuilder(make_options())
        results = drive_ct(builder, duration=2.5, speed=0.05, yaw_rate=0.2, odom_noise=0.001, seed=1)
        assert len(results) >= 3
        r = results[-1]
        _, gt_q = gt_pose(r.time, speed=0.05, yaw_rate=0.2)
        yaw_est = nq.quat_yaw(r.local_pose.q)
        yaw_gt = nq.quat_yaw(gt_q)
        assert abs(yaw_est - yaw_gt) < 0.08, f"yaw {yaw_est} vs {yaw_gt}"


def test_per_point_unwarping_mode():
    """use_per_point_unwarping: points carry real per-point timestamps
    spanning the scan period (ref: use_per_point_unwarping,
    AddPerPointMatchingResiduals)."""
    options = replace_deep(
        make_options(),
        {"optimizing_local_trajectory_builder.use_per_point_unwarping": True},
    )
    builder = OptimizingLocalTrajectoryBuilder(options)
    rng = np.random.default_rng(3)
    dt_imu, dt_odom, dt_scan = 0.01, 0.05, 0.1
    speed = 0.2
    t, next_odom, next_scan = 0.0, 0.0, 0.05
    results = []
    while t <= 2.5:
        _, q = gt_pose(t, speed)
        builder.add_imu_data(t, nq.quat_rotate(nq.quat_conjugate(q), GRAVITY), np.zeros(3))
        if t >= next_odom:
            pt, pq = gt_pose(t, speed)
            builder.add_odometry_data(t, NpRigid3(pt + rng.normal(0, 0.002, 3), pq))
            next_odom += dt_odom
        if t >= next_scan:
            pt, pq = gt_pose(t, speed)
            pts = raycast_box_room_3d(pt, pq, num_azimuth=96, num_elevation=24)
            valid = ~np.isnan(pts[:, 0])
            pts = pts[valid]
            # per-point times spread across the scan period
            times = np.linspace(-dt_scan, 0.0, len(pts)).astype(np.float32)
            cloud = pad_timed_cloud(pts, times, 2560)
            res = builder.add_range_data(
                TimedPointCloudData(
                    time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud, width=96
                )
            )
            if res is not None:
                results.append(res)
            next_scan += dt_scan
        t = round(t + dt_imu, 6)
    assert len(results) >= 4
    errs = [np.linalg.norm(r.local_pose.t - gt_pose(r.time, speed)[0]) for r in results[1:]]
    assert max(errs) < 0.15, f"max pose error {max(errs)}"


def test_direct_imu_cost_term():
    """imu_cost_term=DIRECT: the solver integrates raw IMU samples inside
    the residual (ref: proto::DIRECT +
    prediction_direct_imu_integration_cost_functor.h). Same straight-drive
    scenario must still track the pose."""
    options = replace_deep(
        make_options(),
        {"optimizing_local_trajectory_builder.imu_cost_term": "DIRECT"},
    )
    builder = OptimizingLocalTrajectoryBuilder(options)
    rng = np.random.default_rng(5)
    dt_imu, dt_odom, dt_scan = 0.01, 0.05, 0.1
    speed = 0.2
    t, next_odom, next_scan = 0.0, 0.0, 0.05
    results = []
    while t <= 2.5:
        _, q = gt_pose(t, speed)
        builder.add_imu_data(t, nq.quat_rotate(nq.quat_conjugate(q), GRAVITY), np.zeros(3))
        if t >= next_odom:
            pt, pq = gt_pose(t, speed)
            builder.add_odometry_data(t, NpRigid3(pt + rng.normal(0, 0.002, 3), pq))
            next_odom += dt_odom
        if t >= next_scan:
            pt, pq = gt_pose(t, speed)
            pts = raycast_box_room_3d(pt, pq, num_azimuth=96, num_elevation=24)
            valid = ~np.isnan(pts[:, 0])
            pts = pts[valid]
            cloud = pad_timed_cloud(pts, np.zeros(len(pts), np.float32), 2560)
            res = builder.add_range_data(
                TimedPointCloudData(
                    time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud, width=96
                )
            )
            if res is not None:
                results.append(res)
            next_scan += dt_scan
        t = round(t + dt_imu, 6)
    assert len(results) >= 4
    assert builder.num_optimizations > 0
    errs = [np.linalg.norm(r.local_pose.t - gt_pose(r.time, speed)[0]) for r in results[1:]]
    assert max(errs) < 0.15, f"max pose error {max(errs)}"
