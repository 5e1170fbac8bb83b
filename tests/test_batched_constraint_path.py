"""Production pose graph routes loop-closure rounds through the batched/
sharded constraint search (VERDICT r2 #1).

The reference computes every (node, finished submap) candidate
concurrently on the thread pool (ref: constraint_builder_3d.cc:162-189,
merge barrier :150-160); here all candidates of a round run in ONE
mesh-sharded matcher launch + ONE batched GN launch. These tests assert
the batched path (a) actually runs in production add_node rounds and
(b) produces the same constraints as the serial per-candidate path.
"""

import numpy as np
import pytest

import hectorgrapher_tpu.mapping.pose_graph.pose_graph as pg_mod
from hectorgrapher_tpu.common.config import (
    MapBuilderOptions,
    ProbabilityGridRangeDataInserterOptions2D,
    TSDFRangeDataInserterOptions3D,
    replace_deep,
)
from hectorgrapher_tpu.evaluation.scan_generator import (
    raycast_box_room_3d,
    raycast_rect_room_2d,
)
from hectorgrapher_tpu.mapping.grids import make_probability_grid, make_tsdf_grid
from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
    PgNode,
    PoseGraph2D,
    PoseGraph3D,
)
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import (
    compute_histogram,
)
from hectorgrapher_tpu.mapping.submap_2d import Submap2D
from hectorgrapher_tpu.mapping.submap_3d import Submap3D
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import compact_cloud, voxel_filter
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

import jax.numpy as jnp

HIST = 120


def options_2d(batched: bool):
    return replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.use_batched_constraint_search": batched,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.45,
            "pose_graph.constraint_builder.max_constraint_distance": 10.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 0.8,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.angular_search_window": np.radians(15.0),
            # The whole synthetic drift sits on ONE consecutive-node edge;
            # at the default 1e5 the local-SLAM residual would pin it (in a
            # real loop the correction spreads over many edges).
            "pose_graph.optimization_problem.local_slam_pose_translation_weight": 1e3,
            "pose_graph.optimization_problem.local_slam_pose_rotation_weight": 1e3,
            # ... and the Huber loss would saturate the one large INTER
            # residual carrying it (quadratic local edges would win).
            "pose_graph.optimization_problem.huber_scale": 1e5,
        },
    ).pose_graph


def scan_2d(pose_t, yaw=0.0, num_rays=480):
    pts = raycast_rect_room_2d(
        np.asarray(pose_t, float)[:2], yaw, half_width=4.02, half_height=3.41, num_rays=num_rays
    )
    pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
    # Asymmetrize the room (see test_pose_graph_3d_integration.scan_at).
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    world = np.asarray(pose_t, float)[None, :] + nq.quat_rotate(q, pts)
    keep = ~((world[:, 0] > 1.5) & (world[:, 1] > 0.8))
    return pts[keep]


def build_finished_submap_2d(scan_poses):
    grid = make_probability_grid(0.05, (256, 256))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=12.8, resolution=0.05
    )
    for pose_t in scan_poses:
        pts = scan_2d(pose_t) + np.asarray(pose_t, np.float32)
        grid = insert(
            grid,
            RangeData(
                origin=jnp.asarray(np.asarray(pose_t, np.float32)),
                returns=pad_cloud(pts, 1024),
                misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
            ),
        )
    return Submap2D(
        local_pose=NpRigid3(np.zeros(3)),
        grid=grid,
        insertion_finished=True,
    )


def node_2d(time, local_t, true_t, yaw=0.0):
    pts = scan_2d(true_t, yaw)
    cloud = compact_cloud(voxel_filter(pad_cloud(pts, 2048), 0.05), 512)
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    return PgNode(
        time=time,
        local_pose=NpRigid3(np.asarray(local_t, float), q),
        global_pose=NpRigid3.identity(),
        cloud=cloud,
    )


def active_submap_2d():
    return Submap2D(
        local_pose=NpRigid3(np.array([0.5, 0.0, 0.0])),
        grid=make_probability_grid(0.05, (32, 32)),
        insertion_finished=False,
    )


@pytest.fixture(scope="module")
def anchors_2d():
    a1 = build_finished_submap_2d([np.zeros(3), np.array([0.4, 0.3, 0.0])])
    a2 = build_finished_submap_2d([np.array([0.3, -0.3, 0.0]), np.array([0.7, 0.0, 0.0])])
    return a1, a2


def drive_2d(anchors, batched: bool, monkeypatch=None):
    a1, a2 = anchors
    pg = PoseGraph2D(options_2d(batched))
    # Two nodes INTRA to the anchors: adding them also marks the anchors
    # finished, making them loop-closure candidates for later nodes.
    pg.add_node(node_2d(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [a1])
    pg.add_node(node_2d(0.1, [0.4, 0.3, 0.0], [0.4, 0.3, 0.0]), [a2])
    # Returning node with 0.3 m drift, INTRA only to an active submap:
    # its INTER round has TWO gate-passing candidates (a1 and a2) — the
    # batched launch in one call.
    drift = np.array([0.3, 0.0, 0.0])
    truth = np.array([0.3, -0.2, 0.0])
    pg.add_node(node_2d(0.2, truth + drift, truth), [active_submap_2d()])
    pg.wait_for_all_computations()
    return pg


class TestBatched2D:
    def test_batched_path_runs_and_matches_serial(self, anchors_2d, monkeypatch):
        calls = []
        orig = pg_mod._observe_batched_round
        monkeypatch.setattr(
            pg_mod, "_observe_batched_round", lambda n: (calls.append(n), orig(n))
        )
        pg_batched = drive_2d(anchors_2d, batched=True)
        assert calls and max(calls) >= 2, "batched launch did not run"
        pg_serial = drive_2d(anchors_2d, batched=False)

        def inter(pg):
            return sorted(
                (
                    (pg.nodes[c.node_index].node_id, pg.submaps[c.submap_index].submap_id, c)
                    for c in pg.constraints
                    if c.tag == "INTER"
                ),
                key=lambda x: (x[0], x[1]),
            )

        ib, isr = inter(pg_batched), inter(pg_serial)
        assert len(ib) >= 2, f"expected >=2 INTER constraints, got {len(ib)}"
        assert [(n, s) for n, s, _ in ib] == [(n, s) for n, s, _ in isr]
        for (_, _, cb), (_, _, cs) in zip(ib, isr):
            np.testing.assert_allclose(cb.zbar.t, cs.zbar.t, atol=1e-4)
            assert abs(nq.quat_yaw(cb.zbar.q) - nq.quat_yaw(cs.zbar.q)) < 1e-4

    def test_corrects_drift_through_batched_path(self, anchors_2d):
        pg = drive_2d(anchors_2d, batched=True)
        truth = np.array([0.3, -0.2, 0.0])
        node = pg.nodes[-1]
        before = np.linalg.norm(node.global_pose.t - truth)
        assert before > 0.25
        pg.run_final_optimization()
        after = np.linalg.norm(node.global_pose.t - truth)
        assert after < 0.12, f"batched loop closure failed: {after:.3f} m (was {before:.3f})"


# ---------------------------------------------------------------------------
# 3D — the reference's actual fan-out workload
# ---------------------------------------------------------------------------


def options_3d(batched: bool):
    return replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.use_batched_constraint_search": batched,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.4,
            "pose_graph.constraint_builder.max_constraint_distance": 10.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_xy_search_window": 1.5,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_z_search_window": 0.4,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.angular_search_window": np.radians(15.0),
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.branch_and_bound_depth": 4,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_rotational_score": 0.2,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_low_resolution_score": 0.3,
        },
    ).pose_graph


def scan_3d(pose_t, yaw=0.0, n_az=96, n_el=20):
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    pts = raycast_box_room_3d(np.asarray(pose_t, float), q, num_azimuth=n_az, num_elevation=n_el)
    pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
    world = np.asarray(pose_t, float)[None, :] + nq.quat_rotate(q, pts)
    keep = ~((world[:, 0] > 1.5) & (world[:, 1] > 0.8))
    return pts[keep]


def build_finished_submap_3d(scan_poses):
    hi = make_tsdf_grid(0.1, (96, 96, 32), truncation_distance=0.3, max_weight=1000.0)
    lo = make_tsdf_grid(0.45, (32, 32, 12), truncation_distance=1.0, max_weight=1000.0)
    opts = TSDFRangeDataInserterOptions3D(
        normal_computation_method="NONE", min_range=0.4, max_range=30.0
    )
    ins_hi = make_tsdf_inserter_3d(opts, 0.1)
    ins_lo = make_tsdf_inserter_3d(opts, 0.45)
    hist = np.zeros(HIST, np.float32)
    for pose_t in scan_poses:
        pts = scan_3d(pose_t, n_az=192, n_el=40) + np.asarray(pose_t, np.float32)
        rd = RangeData(
            origin=jnp.asarray(pose_t, jnp.float32),
            returns=pad_cloud(pts, 8192),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 4),
        )
        hi = ins_hi(hi, rd)
        lo = ins_lo(lo, rd)
        hc = pad_cloud(pts, 8192)
        hist += np.asarray(compute_histogram(hc.positions, hc.mask, HIST))
    return Submap3D(
        local_pose=NpRigid3(np.zeros(3)),
        high_resolution_grid=hi,
        low_resolution_grid=lo,
        rotational_histogram=hist,
        num_range_data=len(scan_poses),
        insertion_finished=True,
    )


def node_3d(time, local_t, true_t, yaw=0.0):
    pts = scan_3d(true_t, yaw)
    high = compact_cloud(voxel_filter(pad_cloud(pts, 4096), 0.15), 1024)
    low = compact_cloud(voxel_filter(pad_cloud(pts, 4096), 0.45), 512)
    hist = np.asarray(compute_histogram(high.positions, high.mask, HIST))
    q = nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw]))
    return PgNode(
        time=time,
        local_pose=NpRigid3(np.asarray(local_t, float), q),
        global_pose=NpRigid3.identity(),
        high_cloud=high,
        low_cloud=low,
        histogram=hist,
    )


def active_submap_3d():
    return Submap3D(
        local_pose=NpRigid3(np.array([0.5, 0.0, 0.0])),
        high_resolution_grid=make_tsdf_grid(0.1, (16, 16, 16), 0.3, 1000.0),
        low_resolution_grid=make_tsdf_grid(0.45, (8, 8, 8), 1.0, 1000.0),
        rotational_histogram=np.zeros(HIST, np.float32),
        num_range_data=1,
    )


@pytest.fixture(scope="module")
def anchors_3d():
    a1 = build_finished_submap_3d([np.zeros(3), np.array([0.4, 0.3, 0.0])])
    a2 = build_finished_submap_3d([np.array([0.3, -0.3, 0.0]), np.array([0.7, 0.0, 0.0])])
    return a1, a2


def drive_3d(anchors, batched: bool):
    a1, a2 = anchors
    pg = PoseGraph3D(options_3d(batched), histogram_size=HIST)
    pg.add_node(node_3d(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [a1])
    pg.add_node(node_3d(0.1, [0.4, 0.3, 0.0], [0.4, 0.3, 0.0]), [a2])
    drift = np.array([0.3, 0.0, 0.0])
    truth = np.array([0.3, -0.2, 0.0])
    pg.add_node(node_3d(0.2, truth + drift, truth), [active_submap_3d()])
    pg.wait_for_all_computations()
    return pg


class TestBatched3D:
    def test_batched_path_runs_and_matches_serial(self, anchors_3d, monkeypatch):
        calls = []
        orig = pg_mod._observe_batched_round
        monkeypatch.setattr(
            pg_mod, "_observe_batched_round", lambda n: (calls.append(n), orig(n))
        )
        pg_batched = drive_3d(anchors_3d, batched=True)
        assert calls and max(calls) >= 2, "batched 3D launch did not run"
        pg_serial = drive_3d(anchors_3d, batched=False)

        def inter(pg):
            return sorted(
                (
                    (pg.nodes[c.node_index].node_id, pg.submaps[c.submap_index].submap_id, c)
                    for c in pg.constraints
                    if c.tag == "INTER"
                ),
                key=lambda x: (x[0], x[1]),
            )

        ib, isr = inter(pg_batched), inter(pg_serial)
        assert len(ib) >= 1, "no INTER constraint through the batched 3D path"
        assert [(n, s) for n, s, _ in ib] == [(n, s) for n, s, _ in isr]
        for (_, _, cb), (_, _, cs) in zip(ib, isr):
            np.testing.assert_allclose(cb.zbar.t, cs.zbar.t, atol=1e-3)
            dq = nq.quat_multiply(nq.quat_conjugate(cb.zbar.q), cs.zbar.q)
            assert abs(1.0 - abs(dq[0])) < 1e-6
