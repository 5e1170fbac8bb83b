"""Checkpoint round-trip + pure localization tests
(ref: map_builder_test.cc SaveLoadState + LocalizationOnFrozenTrajectory)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.io.serialization import load_state, save_state
from hectorgrapher_tpu.mapping.map_builder import MapBuilder
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import TrajectoryState
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
            "trajectory_builder_2d.submaps.grid_size": 512,
            "trajectory_builder_2d.submaps.num_range_data": 8,
            "trajectory_builder_2d.max_num_points": 2048,
            "trajectory_builder_2d.motion_filter.max_distance_meters": 0.05,
            "trajectory_builder_2d.motion_filter.max_time_seconds": 0.1,
            "pose_graph.optimize_every_n_nodes": 0,  # manual optimization
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.45,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 1.5,
        },
    )


def drive_line(mb, n=10, speed=0.08, rng=None, t0=0.0):
    tb = mb.get_trajectory_builder(mb.num_trajectory_builders() - 1)
    rng = rng or np.random.default_rng(0)
    for i in range(n):
        t = t0 + 0.1 * i
        x = speed * i
        tb.add_odometry_data(t, NpRigid3(np.array([x, 0.0, 0.0]), nq.quat_identity()))
        pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=1440)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 2048)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )
    return tb


class TestSerialization:
    def test_round_trip(self, tmp_path):
        mb = MapBuilder(make_options())
        mb.add_trajectory_builder()
        drive_line(mb, n=10)
        pg = mb.pose_graph
        path = str(tmp_path / "state.npz")
        save_state(pg, path)

        mb2 = MapBuilder(make_options())
        remap = load_state(mb2.pose_graph, path, load_frozen_state=False)
        pg2 = mb2.pose_graph
        assert len(pg2.nodes) == len(pg.nodes)
        assert len(pg2.submaps) == len(pg.submaps)
        assert len(pg2.constraints) == len(pg.constraints)
        np.testing.assert_allclose(
            pg2.nodes[-1].global_pose.t, pg.nodes[-1].global_pose.t, atol=1e-9
        )
        grid = pg2.submaps[0].submap.grid
        orig = pg.submaps[0].submap.grid
        # float16 storage: coarse but faithful
        np.testing.assert_allclose(
            np.asarray(grid.log_odds), np.asarray(orig.log_odds), atol=2e-3
        )

    def test_pure_localization_against_frozen_map(self, tmp_path):
        # Build and save a map.
        mb = MapBuilder(make_options())
        mb.add_trajectory_builder()
        drive_line(mb, n=18)
        # Finish submaps so they are loop-closure targets.
        for s in mb.pose_graph.submaps:
            s.submap.insertion_finished = True
            s.finished = True
        path = str(tmp_path / "map.npz")
        save_state(mb.pose_graph, path)

        # New session: load frozen, run a new trajectory displaced from the
        # map origin; localization = INTER constraints against frozen submaps.
        mb2 = MapBuilder(make_options())
        remap = load_state(mb2.pose_graph, path, load_frozen_state=True)
        frozen_id = list(remap.values())[0]
        assert mb2.pose_graph._trajectory_states[frozen_id] == TrajectoryState.FROZEN

        mb2.add_trajectory_builder()
        drive_line(mb2, n=8, rng=np.random.default_rng(1))
        pg2 = mb2.pose_graph
        inter = [
            c
            for c in pg2.constraints
            if c.tag == "INTER" and pg2.submaps[c.submap_index].trajectory_id == frozen_id
        ]
        assert len(inter) >= 1, "localization constraints against the frozen map expected"

        pg2.run_final_optimization()
        # Frozen poses unchanged by optimization.
        np.testing.assert_allclose(
            pg2.nodes[0].global_pose.t, np.asarray(pg2.nodes[0].global_pose.t), atol=1e-12
        )
        # New-trajectory nodes should localize near their true x positions.
        new_nodes = [n for n in pg2.nodes if n.trajectory_id != frozen_id]
        assert new_nodes
        for i, n in enumerate(new_nodes):
            gt_x = 0.08 * i
            err = np.linalg.norm(n.global_pose.t[:2] - np.array([gt_x, 0.0]))
            assert err < 0.25, f"node {i} localization error {err}"
