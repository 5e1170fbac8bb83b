"""CT optimizer component tests
(ref: imu_integration_test.cc, imu_integration_rk4_test.cc,
rotational_scan_matcher_test.cc)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.ct import imu_integration
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import (
    compute_histogram,
    match_histograms,
    rotate_histogram,
)
from hectorgrapher_tpu.transform import np_quat as nq


class TestImuIntegration:
    def test_constant_yaw_rate(self):
        times = np.linspace(0.0, 1.0, 101)
        gyro = np.tile(np.array([0.0, 0.0, 0.5]), (101, 1))
        dq = imu_integration.integrate_gyro(times, gyro, 0.0, 1.0)
        aa = nq.quat_to_axis_angle(dq)
        np.testing.assert_allclose(aa, [0.0, 0.0, 0.5], atol=1e-6)

    def test_partial_interval(self):
        times = np.linspace(0.0, 1.0, 101)
        gyro = np.tile(np.array([0.1, 0.0, 0.0]), (101, 1))
        dq = imu_integration.integrate_gyro(times, gyro, 0.25, 0.75)
        aa = nq.quat_to_axis_angle(dq)
        np.testing.assert_allclose(aa, [0.05, 0.0, 0.0], atol=1e-6)

    def test_accel_integration_static_frame(self):
        times = np.linspace(0.0, 1.0, 101)
        acc = np.tile(np.array([1.0, 0.0, 0.0]), (101, 1))
        gyro = np.zeros((101, 3))
        dq, dv, dp = imu_integration.integrate_imu(times, acc, gyro, 0.0, 1.0)
        np.testing.assert_allclose(dv, [1.0, 0.0, 0.0], atol=1e-3)
        np.testing.assert_allclose(dp, [0.5, 0.0, 0.0], atol=1e-2)

    def test_static_calibration(self):
        times = np.linspace(0.0, 1.0, 50)
        acc = np.tile(np.array([0.0, 0.0, 9.5]), (50, 1))
        g, cal = imu_integration.calibrate_imu_static(times, acc)
        # The calibration rescales accel to the standard gravity constant,
        # which stays authoritative — calibrated magnitude == g, so the
        # integrator's gravity subtraction is bias-free.
        np.testing.assert_allclose(g, 9.80665, atol=1e-6)
        np.testing.assert_allclose(cal[0, 0], 9.80665 / 9.5, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(cal @ acc[0]), g, atol=1e-6)


def box_cloud(yaw=0.0, n=400, seed=0):
    """Points on the walls of a rectangle (extruded in z), rotated by yaw."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(n):
        side = i % 4
        u = rng.uniform(-1, 1)
        z = rng.uniform(-0.4, 0.4)
        if side == 0:
            p = [3.0, u * 2.0, z]
        elif side == 1:
            p = [-3.0, u * 2.0, z]
        elif side == 2:
            p = [u * 3.0, 2.0, z]
        else:
            p = [u * 3.0, -2.0, z]
        pts.append(p)
    pts = np.asarray(pts, np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return pts @ rot.T


class TestRotationalHistogram:
    def test_rotated_cloud_matches_at_rotation(self):
        cloud0 = box_cloud(0.0)
        cloud1 = box_cloud(0.3)
        h0 = compute_histogram(jnp.asarray(cloud0), jnp.ones(len(cloud0), bool), 120)
        h1 = compute_histogram(jnp.asarray(cloud1), jnp.ones(len(cloud1), bool), 120)
        angles = jnp.asarray(np.linspace(-0.6, 0.6, 41))
        scores = np.asarray(match_histograms(h0, h1, angles))
        best = float(angles[int(np.argmax(scores))])
        assert abs(best - (-0.3)) < 0.1 or abs(best - 0.3) < 0.1
        # score at the correct rotation should clearly dominate
        assert scores.max() > 0.6
        assert scores.max() > 5 * np.median(scores)

    def test_identity_match_is_best(self):
        cloud = box_cloud(0.0)
        h = compute_histogram(jnp.asarray(cloud), jnp.ones(len(cloud), bool), 120)
        angles = jnp.asarray(np.linspace(-0.5, 0.5, 21))
        scores = np.asarray(match_histograms(h, h, angles))
        assert np.argmax(scores) == 10  # angle 0

    def test_rotate_histogram_shifts(self):
        h = jnp.zeros(120).at[10].set(1.0)
        r = rotate_histogram(h, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(r), np.asarray(h), atol=1e-6)


class TestRk4Integration:
    def test_rk4_matches_euler_on_constant_rate(self):
        times = np.linspace(0.0, 1.0, 101)
        gyro = np.tile(np.array([0.0, 0.0, 0.4]), (101, 1))
        dq_euler = imu_integration.integrate_gyro(times, gyro, 0.0, 1.0)
        dq_rk4 = imu_integration.integrate_gyro_rk4(times, gyro, 0.0, 1.0)
        np.testing.assert_allclose(
            nq.quat_to_axis_angle(dq_euler), nq.quat_to_axis_angle(dq_rk4), atol=1e-5
        )

    def test_rk4_more_accurate_on_ramping_rate(self):
        # omega(t) = [0, 0, t]: exact integral = 0.5 rad about z at t=1.
        times = np.linspace(0.0, 1.0, 11)  # coarse sampling
        gyro = np.stack([np.zeros(11), np.zeros(11), times], axis=1)
        exact = 0.5
        aa_rk4 = nq.quat_to_axis_angle(imu_integration.integrate_gyro_rk4(times, gyro, 0.0, 1.0))
        aa_euler = nq.quat_to_axis_angle(imu_integration.integrate_gyro(times, gyro, 0.0, 1.0))
        assert abs(aa_rk4[2] - exact) < abs(aa_euler[2] - exact)
        assert abs(aa_rk4[2] - exact) < 1e-4
