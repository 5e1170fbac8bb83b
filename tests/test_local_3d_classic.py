"""Classic discrete-time 3D front-end test
(ref: local_trajectory_builder_3d_test.cc — drive with IMU + odometry on
synthetic scans, bounded error)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.common.config import TrajectoryBuilder3DOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.local_3d import LocalTrajectoryBuilder3D
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

GRAVITY = np.array([0.0, 0.0, 9.80665])


def test_straight_drive():
    options = replace_deep(
        TrajectoryBuilder3DOptions(),
        {
            "min_range": 0.4,
            "max_range": 25.0,
            "submaps.grid_type": "PROBABILITY_GRID",
            "submaps.high_grid_size": 96,
            "submaps.low_grid_size": 48,
            # reference 3D motion-filter defaults (0.5 s / 0.1 m) gate
            # re-inserts at standstill, preventing map-smear feedback
        },
    )
    builder = LocalTrajectoryBuilder3D(options)
    rng = np.random.default_rng(0)
    duration, dt_imu, dt_odom, dt_scan = 2.5, 0.01, 0.05, 0.1
    speed, rest = 0.2, 0.5

    def gt_x(tt):
        return speed * max(0.0, tt - rest)
    t, next_odom, next_scan = 0.0, 0.0, 0.05
    results = []
    while t <= duration:
        q = nq.quat_identity()
        builder.add_imu_data(t, nq.quat_rotate(nq.quat_conjugate(q), GRAVITY), np.zeros(3))
        if t >= next_odom:
            builder.add_odometry_data(
                t, NpRigid3(np.array([gt_x(t), 0, 0]) + rng.normal(0, 0.002, 3), q)
            )
            next_odom += dt_odom
        if t >= next_scan:
            pt = np.array([gt_x(t), 0.0, 0.0])
            pts = raycast_box_room_3d(pt, q, num_azimuth=96, num_elevation=24)
            pts = pts[~np.isnan(pts[:, 0])]
            cloud = pad_timed_cloud(pts, np.zeros(len(pts), np.float32), 2560)
            r = builder.add_range_data(
                TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
            )
            if r is not None:
                results.append(r)
            next_scan += dt_scan
        t = round(t + dt_imu, 6)

    assert len(results) >= 10
    errs = [np.linalg.norm(r.local_pose.t - np.array([gt_x(r.time), 0, 0])) for r in results]
    # The discrete pipeline carries a bounded quantization-bias offset
    # (the CT builder exists to beat this); require bounded absolute error
    # and accurate relative motion over the steady-state second half.
    assert max(errs) < 0.2, f"max error {max(errs)}"
    half = len(results) // 2
    est_delta = results[-1].local_pose.t[0] - results[half].local_pose.t[0]
    gt_delta = gt_x(results[-1].time) - gt_x(results[half].time)
    assert abs(est_delta - gt_delta) < 0.2 * max(gt_delta, 0.1), (
        f"relative motion {est_delta} vs gt {gt_delta}"
    )
    assert builder.active_submaps.submaps
