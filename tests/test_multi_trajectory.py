"""Multi-trajectory mapping with cross-trajectory global localization
(ref: BASELINE.json config #5; pose_graph ComputeConstraint global branch
:248-311 + client_server multi-robot semantics)."""

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
            "trajectory_builder_2d.submaps.grid_size": 640,
            "trajectory_builder_2d.submaps.num_range_data": 6,
            "trajectory_builder_2d.max_num_points": 2048,
            "trajectory_builder_2d.motion_filter.max_distance_meters": 0.05,
            "trajectory_builder_2d.motion_filter.max_time_seconds": 0.1,
            "pose_graph.optimize_every_n_nodes": 6,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.global_sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.45,
            "pose_graph.constraint_builder.global_localization_min_score": 0.45,
            "pose_graph.use_global_constraint_search": True,
        },
    )


def drive(tb, xs, t0, rng):
    for i, x in enumerate(xs):
        t = t0 + 0.1 * i
        tb.add_odometry_data(
            t, NpRigid3(np.array([x - xs[0], 0.0, 0.0]) + rng.normal(0, 0.002, 3), nq.quat_identity())
        )
        pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=1440)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 2048)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )


@pytest.mark.slow
def test_second_trajectory_globally_localizes():
    mb = MapBuilder(make_options())
    rng = np.random.default_rng(0)

    # Trajectory 0 maps the room driving +x from the world origin.
    t0_id = mb.add_trajectory_builder()
    drive(mb.get_trajectory_builder(t0_id), np.arange(0.0, 1.61, 0.08), 0.0, rng)
    mb.finish_trajectory(t0_id)
    pg = mb.pose_graph
    # Ensure at least one finished submap for localization targets.
    for s in pg.submaps[:-1]:
        s.submap.insertion_finished = True
        if not s.finished:
            s.finished = True
            pg._on_submap_finished(s)

    # Trajectory 1 starts at world x=0.8 (its own local frame starts at 0).
    t1_id = mb.add_trajectory_builder()
    assert t1_id != t0_id
    drive(mb.get_trajectory_builder(t1_id), np.arange(0.8, 1.9, 0.08), 100.0, rng)

    cross = [
        c
        for c in pg.constraints
        if c.tag == "INTER"
        and pg.submaps[c.submap_index].trajectory_id != pg.nodes[c.node_index].trajectory_id
    ]
    assert cross, "expected cross-trajectory localization constraints"
    assert pg.connectivity.transitively_connected(t0_id, t1_id)

    pg.run_final_optimization()
    # Trajectory 1's nodes should now sit at their true world positions.
    t1_nodes = [n for n in pg.nodes if n.trajectory_id == t1_id]
    errs = []
    for i, n in enumerate(t1_nodes):
        k = int(round((n.time - 100.0) / 0.1))
        gt_x = 0.8 + 0.08 * k
        errs.append(abs(n.global_pose.t[0] - gt_x))
    # Nodes added after the first cross-constraint must be well localized.
    assert min(errs) < 0.15, f"localization errors {errs}"
    assert errs[-1] < 0.2, f"final node error {errs[-1]}"


def test_delete_trajectory_keeps_other_trajectory_intact():
    """DeleteTrajectory removes one trajectory's submaps/nodes/constraints
    and sensor buffers while the survivor keeps optimizing
    (ref: pose_graph DeleteTrajectory; r2 code-review lifecycle fixes)."""
    mb = MapBuilder(make_options())
    rng = np.random.default_rng(3)
    tid0 = mb.add_trajectory_builder()
    tid1 = mb.add_trajectory_builder()
    drive(mb.get_trajectory_builder(tid0), np.linspace(0.0, 0.8, 9), 0.0, rng)
    drive(mb.get_trajectory_builder(tid1), np.linspace(0.1, 0.9, 9), 10.0, rng)
    pg = mb.pose_graph
    pg.wait_for_all_computations()
    assert any(n.trajectory_id == tid0 for n in pg.nodes)
    assert any(n.trajectory_id == tid1 for n in pg.nodes)
    n_t1_nodes = sum(1 for n in pg.nodes if n.trajectory_id == tid1)

    mb.delete_trajectory(tid0)
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import TrajectoryState

    assert pg.trajectory_states()[tid0] == TrajectoryState.DELETED
    assert all(n.trajectory_id == tid1 for n in pg.nodes)
    assert all(s.trajectory_id == tid1 for s in pg.submaps)
    assert len(pg.nodes) <= n_t1_nodes
    # Constraint indices stay consistent and optimization still runs.
    for c in pg.constraints:
        assert 0 <= c.node_index < len(pg.nodes)
        assert 0 <= c.submap_index < len(pg.submaps)
    pg.run_final_optimization()
    assert all(np.isfinite(n.global_pose.t).all() for n in pg.nodes)
