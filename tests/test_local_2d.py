"""End-to-end 2D local SLAM test on a synthetic trajectory
(ref: mapping/map_builder_test.cc LocalSlam2D-style assertions: final pose
error bounded by a fraction of travel distance)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hectorgrapher_tpu.common.config import TrajectoryBuilder2DOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.local_2d import LocalTrajectoryBuilder2D
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def drive(options, poses, times, noise_std=0.0, seed=0, odometry=False, odom_noise=0.0):
    """Run the builder over ground-truth poses; optionally feed odometry."""
    rng = np.random.default_rng(seed)
    builder = LocalTrajectoryBuilder2D(options)
    results = []
    for (t, (xy, yaw)) in zip(times, poses):
        if odometry:
            odom_t = np.array([xy[0], xy[1], 0.0]) + rng.normal(0, odom_noise, 3)
            odom_q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw + rng.normal(0, odom_noise)]))
            builder.add_odometry_data(t, NpRigid3(odom_t, odom_q))
        pts = raycast_rect_room_2d(np.asarray(xy), yaw, num_rays=1440, noise_std=noise_std, rng=rng)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 2048)
        data = TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        results.append(builder.add_range_data(data))
    return results


BASE_OVERRIDES = {
    "use_imu_data": False,
    "use_online_correlative_scan_matching": True,
    "real_time_correlative_scan_matcher.linear_search_window": 0.15,
    "submaps.grid_size": 640,
    "max_num_points": 2048,
    "motion_filter.max_distance_meters": 0.05,
    "motion_filter.max_angle_radians": 0.005,
    "motion_filter.max_time_seconds": 0.1,
}


@pytest.fixture(scope="module")
def options():
    return replace_deep(TrajectoryBuilder2DOptions(), BASE_OVERRIDES)


@pytest.fixture(scope="module")
def weak_prior_options():
    """Odometry-less operation: down-weight the motion prior so the map
    dominates (legitimate config; the defaults assume IMU/odometry)."""
    return replace_deep(
        TrajectoryBuilder2DOptions(),
        {**BASE_OVERRIDES, "ceres_scan_matcher.translation_weight": 1.0, "ceres_scan_matcher.rotation_weight": 4.0},
    )


class TestLocalTrajectoryBuilder2D:
    def test_static_pose(self, options):
        poses = [((0.0, 0.0), 0.0)] * 5
        times = [0.1 * i for i in range(5)]
        results = drive(options, poses, times)
        assert results[-1] is not None
        np.testing.assert_allclose(results[-1].local_pose.t[:2], [0.0, 0.0], atol=0.05)

    def test_straight_line_no_odometry(self, weak_prior_options):
        n = 12
        times = [0.1 * i for i in range(n)]
        poses = [((0.08 * i, 0.0), 0.0) for i in range(n)]
        results = drive(weak_prior_options, poses, times)
        final = results[-1].local_pose
        travel = 0.08 * (n - 1)
        err = np.linalg.norm(final.t[:2] - np.array([travel, 0.0]))
        # reference map_builder_test.cc asserts error < 0.1 * travel
        assert err < 0.15 * travel + 0.03, f"error {err} over travel {travel}"

    def test_drive_with_odometry(self, options):
        n = 15
        times = [0.1 * i for i in range(n)]
        poses = [((0.08 * i, 0.02 * i), 0.02 * i) for i in range(n)]
        results = drive(options, poses, times, noise_std=0.005, seed=1, odometry=True, odom_noise=0.002)
        final = results[-1].local_pose
        gt_xy = np.array([0.08 * (n - 1), 0.02 * (n - 1)])
        err = np.linalg.norm(final.t[:2] - gt_xy)
        assert err < 0.1, f"translation error {err}"
        yaw_err = abs(nq.quat_yaw(final.q) - 0.02 * (n - 1))
        assert yaw_err < 0.03, f"yaw error {yaw_err}"

    def test_insertion_results_populated(self, options):
        poses = [((0.1 * i, 0.0), 0.0) for i in range(4)]
        times = [0.2 * i for i in range(4)]
        results = drive(options, poses, times)
        inserted = [r for r in results if r is not None and r.insertion_result is not None]
        assert len(inserted) >= 3
        assert inserted[0].insertion_result.insertion_submaps
