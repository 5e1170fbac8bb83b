"""3D pose-graph integration: loop closure, global localization via
full-submap search, and 3D state serialization round trips.

(ref: mapping/map_builder_test.cc 3D loop-closure cases,
fast_correlative_scan_matcher_3d.cc MatchFullSubmap:177-201,
pose_graph_3d_test.cc optimization cycles.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
from hectorgrapher_tpu.common.config import TSDFRangeDataInserterOptions3D
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph3D
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import compute_histogram
from hectorgrapher_tpu.mapping.submap_3d import Submap3D
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import compact_cloud, voxel_filter
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

HIST = 120


def pose_graph_options():
    return replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,  # explicit optimization
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.global_sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.4,
            "pose_graph.constraint_builder.global_localization_min_score": 0.4,
            "pose_graph.constraint_builder.max_constraint_distance": 10.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_xy_search_window": 2.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_z_search_window": 0.4,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.angular_search_window": np.radians(20.0),
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.branch_and_bound_depth": 4,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_rotational_score": 0.2,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_low_resolution_score": 0.4,
        },
    ).pose_graph


def scan_at(pose_t, yaw=0.0, n_az=96, n_el=20):
    """Sensor-frame scan of the box room taken from pose_t/yaw.

    A world-frame corner region (x>1.5, y>0.8) is removed from every scan:
    the bare box room is centrosymmetric, so a full-yaw global search
    would legitimately find the 180-degree twin pose. The cut makes the
    environment asymmetric, like any real room."""
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    pts = raycast_box_room_3d(np.asarray(pose_t, float), q, num_azimuth=n_az, num_elevation=n_el)
    pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
    world = np.asarray(pose_t, float)[None, :] + nq.quat_rotate(q, pts)
    keep = ~((world[:, 0] > 1.5) & (world[:, 1] > 0.8))
    return pts[keep]


def node_clouds(pts):
    high = compact_cloud(voxel_filter(pad_cloud(pts, 4096), 0.15), 1024)
    low = compact_cloud(voxel_filter(pad_cloud(pts, 4096), 0.45), 512)
    hist = np.asarray(compute_histogram(high.positions, high.mask, HIST))
    return high, low, hist


def build_finished_submap(scan_poses):
    """Finished Submap3D at the origin built from world-frame insertions."""
    hi = make_tsdf_grid(0.1, (128, 128, 48), truncation_distance=0.3, max_weight=1000.0)
    lo = make_tsdf_grid(0.45, (48, 48, 16), truncation_distance=1.0, max_weight=1000.0)
    opts = TSDFRangeDataInserterOptions3D(normal_computation_method="NONE", min_range=0.4, max_range=30.0)
    ins_hi = make_tsdf_inserter_3d(opts, 0.1)
    ins_lo = make_tsdf_inserter_3d(opts, 0.45)
    hist = np.zeros(HIST, np.float32)
    for pose_t in scan_poses:
        pts = scan_at(pose_t, n_az=256, n_el=48) + np.asarray(pose_t, np.float32)
        rd = RangeData(
            origin=jnp.asarray(pose_t, jnp.float32),
            returns=pad_cloud(pts, 16384),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 4),
        )
        hi = ins_hi(hi, rd)
        lo = ins_lo(lo, rd)
        hc = pad_cloud(pts, 16384)
        hist += np.asarray(compute_histogram(hc.positions, hc.mask, HIST))
    return Submap3D(
        local_pose=NpRigid3(np.zeros(3)),
        high_resolution_grid=hi,
        low_resolution_grid=lo,
        rotational_histogram=hist,
        num_range_data=len(scan_poses),
        insertion_finished=True,
    )


def make_node(time, local_t, true_t, yaw=0.0, trajectory_id=0):
    """Node whose bookkeeping pose is local_t but whose scan was taken at
    true_t — the difference is accumulated local-SLAM drift."""
    high, low, hist = node_clouds(scan_at(true_t, yaw))
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    return PgNode(
        time=time,
        local_pose=NpRigid3(np.asarray(local_t, float), q),
        global_pose=NpRigid3.identity(),
        trajectory_id=trajectory_id,
        high_cloud=high,
        low_cloud=low,
        histogram=hist,
    )


@pytest.fixture(scope="module")
def anchor_submap():
    return build_finished_submap(
        [np.zeros(3), np.array([0.4, 0.3, 0.0]), np.array([0.8, -0.3, 0.0])]
    )


class TestLoopClosure3D:
    def test_inter_constraint_corrects_drift(self, anchor_submap):
        """Out-and-back drive with 0.35 m accumulated drift: the returning
        node's INTER constraint against the first (finished) submap must
        pull the estimate back (ref: map_builder_test.cc LocalSlam3D loop
        cases; constraint_builder_3d.cc ComputeConstraint)."""
        pg = PoseGraph3D(pose_graph_options(), histogram_size=HIST)

        active = Submap3D(
            local_pose=NpRigid3(np.array([1.2, 0.0, 0.0])),
            high_resolution_grid=make_tsdf_grid(0.1, (16, 16, 16), 0.3, 1000.0),
            low_resolution_grid=make_tsdf_grid(0.45, (8, 8, 8), 1.0, 1000.0),
            rotational_histogram=np.zeros(HIST, np.float32),
            num_range_data=1,
        )
        # Early nodes: drift-free, INTRA to the anchor submap.
        pg.add_node(make_node(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [anchor_submap])
        pg.add_node(make_node(0.1, [0.4, 0.3, 0.0], [0.4, 0.3, 0.0]), [anchor_submap])
        # Returning node: truth is [0.3, -0.2, 0], but local SLAM believes
        # [0.65, -0.2, 0] (0.35 m drift). INTRA only to the active submap,
        # so the INTER search vs the anchor is what must fix it.
        drift = np.array([0.35, 0.0, 0.0])
        truth = np.array([0.3, -0.2, 0.0])
        node_index = pg.add_node(make_node(0.2, truth + drift, truth), [active])
        pg.wait_for_all_computations()

        inter = [c for c in pg.constraints if c.tag == "INTER"]
        assert len(inter) >= 1, "no loop closure found"
        assert any(c.node_index == node_index and c.submap_index == 0 for c in inter)

        before = np.linalg.norm(pg.nodes[node_index].global_pose.t - truth)
        assert before > 0.3  # the drift is really in the initial estimate
        pg.run_final_optimization()
        after = np.linalg.norm(pg.nodes[node_index].global_pose.t - truth)
        assert after < 0.15 and after < before / 2, (
            f"loop closure failed to correct drift: {after:.3f} m (was {before:.3f})"
        )


class TestGlobalLocalization3D:
    def test_full_submap_search_localizes_disconnected_trajectory(self, anchor_submap):
        """A node of a never-connected trajectory must localize via
        MatchFullSubmap (full yaw range) — the pose graph's global-search
        branch (ref: pose_graph ComputeConstraint local-vs-global decision
        + fast_correlative_scan_matcher_3d.cc MatchFullSubmap:177-201)."""
        pg = PoseGraph3D(pose_graph_options(), histogram_size=HIST)
        pg.register_trajectory(1)

        # Trajectory 0 owns the finished map.
        pg.add_node(make_node(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [anchor_submap])
        pg.wait_for_all_computations()

        # Trajectory 1 starts at its own origin; its TRUE pose in the map
        # frame is offset and rotated. Its global_pose initializes to
        # identity (no prior connection) — far from the truth.
        truth_t = np.array([0.8, -0.6, 0.1])
        truth_yaw = 0.15
        own = Submap3D(
            local_pose=NpRigid3(np.zeros(3)),
            high_resolution_grid=make_tsdf_grid(0.1, (16, 16, 16), 0.3, 1000.0),
            low_resolution_grid=make_tsdf_grid(0.45, (8, 8, 8), 1.0, 1000.0),
            rotational_histogram=np.zeros(HIST, np.float32),
            num_range_data=1,
        )
        node_index = pg.add_node(
            make_node(10.0, [0.0, 0.0, 0.0], truth_t, yaw=truth_yaw, trajectory_id=1),
            [own],
        )
        pg.wait_for_all_computations()

        inter = [c for c in pg.constraints if c.tag == "INTER" and c.node_index == node_index]
        assert inter, "global localization found no constraint"
        # The constraint's zbar IS the localization: node pose in the
        # anchor submap frame.
        zbar = inter[0].zbar
        np.testing.assert_allclose(zbar.t, truth_t, atol=0.15)
        assert abs(nq.quat_yaw(zbar.q) - truth_yaw) < 0.06

        # After optimization the trajectories are connected and the node's
        # global pose lands on the truth.
        pg.run_final_optimization()
        assert pg.connectivity.transitively_connected(0, 1)
        np.testing.assert_allclose(pg.nodes[node_index].global_pose.t, truth_t, atol=0.15)


class TestSerialization3D:
    def test_3d_state_round_trip_and_frozen_localization(self, anchor_submap, tmp_path):
        """3D save -> load preserves grids/clouds/constraints; a frozen
        load localizes a new trajectory against the prior map with the
        frozen poses held constant (ref: map_builder.cc LoadState:227-404
        + pure localization)."""
        from hectorgrapher_tpu.common.config import MapBuilderOptions
        from hectorgrapher_tpu.io.serialization import load_state, save_state

        pg = PoseGraph3D(pose_graph_options(), histogram_size=HIST)
        pg.add_node(make_node(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [anchor_submap])
        pg.add_node(make_node(0.1, [0.4, 0.3, 0.0], [0.4, 0.3, 0.0]), [anchor_submap])
        pg.wait_for_all_computations()
        path = str(tmp_path / "state3d.npz")
        save_state(pg, path)

        pg2 = PoseGraph3D(pose_graph_options(), histogram_size=HIST)
        remap = load_state(pg2, path, load_frozen_state=True)
        frozen_id = remap[0]
        assert pg2.is_frozen(frozen_id)
        assert len(pg2.nodes) == 2 and len(pg2.submaps) == 1
        # Grid payloads survive (f16 storage tolerance).
        np.testing.assert_allclose(
            np.asarray(pg2.submaps[0].submap.high_resolution_grid.tsd),
            np.asarray(anchor_submap.high_resolution_grid.tsd),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(pg2.submaps[0].submap.rotational_histogram),
            np.asarray(anchor_submap.rotational_histogram),
            rtol=1e-6,
        )
        assert pg2.nodes[0].high_cloud is not None
        assert len(pg2.constraints) == 2  # the INTRA constraints

        # Pure localization: new trajectory finds the frozen map.
        new_tid = frozen_id + 1
        pg2.register_trajectory(new_tid)
        truth_t = np.array([0.8, -0.6, 0.1])
        own = Submap3D(
            local_pose=NpRigid3(np.zeros(3)),
            high_resolution_grid=make_tsdf_grid(0.1, (16, 16, 16), 0.3, 1000.0),
            low_resolution_grid=make_tsdf_grid(0.45, (8, 8, 8), 1.0, 1000.0),
            rotational_histogram=np.zeros(HIST, np.float32),
            num_range_data=1,
        )
        frozen_pose_before = pg2.submaps[0].global_pose.t.copy()
        node_index = pg2.add_node(
            make_node(20.0, [0.0, 0.0, 0.0], truth_t, trajectory_id=new_tid), [own]
        )
        pg2.wait_for_all_computations()
        assert any(c.tag == "INTER" and c.node_index == node_index for c in pg2.constraints)
        pg2.run_final_optimization()
        # Frozen map did not move; the new node localized onto it.
        np.testing.assert_allclose(pg2.submaps[0].global_pose.t, frozen_pose_before, atol=1e-9)
        np.testing.assert_allclose(pg2.nodes[node_index].global_pose.t, truth_t, atol=0.15)
