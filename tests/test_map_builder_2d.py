"""Full 2D SLAM integration test
(ref: mapping/map_builder_test.cc GlobalSlam2D — run local + pose graph on
synthetic scans, assert pose error bounds after final optimization)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.map_builder import MapBuilder
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def make_options():
    return replace_deep(
        MapBuilderOptions(),
        {
            "use_trajectory_builder_2d": True,
            "trajectory_builder_2d.use_imu_data": False,
            "trajectory_builder_2d.use_online_correlative_scan_matching": True,
            "trajectory_builder_2d.real_time_correlative_scan_matcher.linear_search_window": 0.15,
            "trajectory_builder_2d.submaps.grid_size": 640,
            "trajectory_builder_2d.submaps.num_range_data": 12,
            "trajectory_builder_2d.max_num_points": 2048,
            "trajectory_builder_2d.motion_filter.max_distance_meters": 0.05,
            "trajectory_builder_2d.motion_filter.max_angle_radians": 0.005,
            "trajectory_builder_2d.motion_filter.max_time_seconds": 0.1,
            "pose_graph.optimize_every_n_nodes": 10,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.45,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 2.0,
            "pose_graph.constraint_builder.max_constraint_distance": 12.0,
        },
    )


def circle_trajectory(n_steps=36, radius=1.4, center=(0.6, 0.5)):
    """Smooth loop: drive a circle with tangent heading (yaw rate ~1.6
    rad/s at 10 Hz — realistic platform dynamics; the reference pipeline
    also assumes motion the extrapolator can follow)."""
    poses = []
    for i in range(n_steps + 1):
        a = 2 * np.pi * i / n_steps
        xy = np.array([center[0] + radius * np.cos(a), center[1] + radius * np.sin(a)])
        yaw = a + np.pi / 2
        poses.append((xy, yaw))
    return poses


class TestMapBuilder2D:
    def test_square_loop_with_odometry(self):
        options = make_options()
        mb = MapBuilder(options)
        tid = mb.add_trajectory_builder()
        tb = mb.get_trajectory_builder(tid)

        rng = np.random.default_rng(0)
        poses = circle_trajectory()
        for i, (xy, yaw) in enumerate(poses):
            t = 0.1 * i
            odom_noise = rng.normal(0, 0.003, 3)
            tb.add_odometry_data(
                t,
                NpRigid3(
                    np.array([xy[0], xy[1], 0.0]) + odom_noise,
                    nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw + rng.normal(0, 0.002)])),
                ),
            )
            pts = raycast_rect_room_2d(xy, yaw, num_rays=1440, noise_std=0.004, rng=rng)
            pts = pts[~np.isnan(pts[:, 0])]
            cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 2048)
            tb.add_range_data(
                TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
            )

        pg = mb.pose_graph
        assert len(pg.nodes) >= 20
        assert len(pg.submaps) >= 2
        intra = [c for c in pg.constraints if c.tag == "INTRA"]
        assert len(intra) >= len(pg.nodes)

        pg.run_final_optimization()

        # After optimization, global node poses should match ground truth
        # expressed relative to the starting pose (the SLAM frame anchor).
        xy0, yaw0 = poses[0]
        c0, s0 = np.cos(yaw0), np.sin(yaw0)
        errs = []
        for node in pg.nodes:
            t_idx = int(round(node.time / 0.1))
            gt_xy, gt_yaw = poses[t_idx]
            d = gt_xy - xy0
            gt_rel = np.array([c0 * d[0] + s0 * d[1], -s0 * d[0] + c0 * d[1]])
            errs.append(np.linalg.norm(node.global_pose.t[:2] - gt_rel))
        # reference map_builder_test.cc bounds error by 0.1 * travel
        travel = 2 * np.pi * 1.4
        max_err = max(errs)
        assert max_err < 0.1 * travel, f"max global pose error {max_err}"
        assert float(np.mean(errs)) < 0.25, f"mean global pose error {np.mean(errs)}"

    @pytest.mark.slow
    def test_loop_closure_found(self):
        """Drive two laps so that revisits create INTER constraints."""
        options = make_options()
        mb = MapBuilder(options)
        tid = mb.add_trajectory_builder()
        tb = mb.get_trajectory_builder(tid)

        rng = np.random.default_rng(1)
        poses = circle_trajectory() + circle_trajectory()
        for i, (xy, yaw) in enumerate(poses):
            t = 0.1 * i
            tb.add_odometry_data(
                t,
                NpRigid3(
                    np.array([xy[0], xy[1], 0.0]) + rng.normal(0, 0.002, 3),
                    nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw])),
                ),
            )
            pts = raycast_rect_room_2d(xy, yaw, num_rays=1440)
            pts = pts[~np.isnan(pts[:, 0])]
            cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 2048)
            tb.add_range_data(
                TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
            )

        inter = [c for c in mb.pose_graph.constraints if c.tag == "INTER"]
        assert len(inter) >= 1, "expected loop-closure constraints on the second lap"
