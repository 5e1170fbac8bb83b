"""Cross-trajectory batched CT window serving on the PRODUCTION server
path (VERDICT r3 #6): a multi-trajectory MapBuilderServer in
batch_ct_windows mode must solve N trajectories' ready windows in ONE
batched launch (cloud/ct_batcher.py) with per-trajectory results matching
the serial server (ref: map_builder_server.cc:157-176 — the reference
serializes everything on one SLAM thread; the TPU server beats that by
batching the solves)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.cloud.server import MapBuilderServer
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.map_builder import MapBuilder
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

GRAVITY = np.array([0.0, 0.0, 9.80665])


def make_options():
    return replace_deep(
        MapBuilderOptions(),
        {
            "use_trajectory_builder_3d": True,
            "trajectory_builder_3d.min_range": 0.4,
            "trajectory_builder_3d.max_range": 25.0,
            "trajectory_builder_3d.submaps.grid_type": "TSDF",
            "trajectory_builder_3d.submaps.high_grid_size": 48,
            "trajectory_builder_3d.submaps.low_grid_size": 24,
            "trajectory_builder_3d.motion_filter.max_distance_meters": 0.02,
            "trajectory_builder_3d.motion_filter.max_angle_radians": 0.002,
            "trajectory_builder_3d.motion_filter.max_time_seconds": 0.05,
            "trajectory_builder_3d.optimizing_local_trajectory_builder.initialization_duration": 0.45,
            "trajectory_builder_3d.optimizing_local_trajectory_builder.max_control_points": 8,
            "trajectory_builder_3d.optimizing_local_trajectory_builder.max_clouds_in_window": 8,
            "trajectory_builder_3d.optimizing_local_trajectory_builder.points_per_cloud": 128,
            "trajectory_builder_3d.optimizing_local_trajectory_builder.max_num_iterations": 6,
            # Real back-end work runs CONCURRENTLY with the per-trajectory
            # workers (constraint rounds + periodic SPA) — exercising the
            # pose graph's _constraint_lock serialization, not a quiesced
            # graph.
            "trajectory_builder_3d.submaps.num_range_data": 3,
            "pose_graph.optimize_every_n_nodes": 6,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.max_constraint_distance": 100.0,
            "pose_graph.constraint_builder.min_score": 0.2,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_xy_search_window": 0.6,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_z_search_window": 0.3,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.angular_search_window": 0.17,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.branch_and_bound_depth": 3,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_rotational_score": 0.1,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_low_resolution_score": 0.1,
        },
    )


def sensor_items(trajectory_id: int, duration: float = 1.1):
    """One trajectory's (tid, kind, payload) stream — per-trajectory
    content identical across trajectories except a speed offset."""
    rng = np.random.default_rng(100 + trajectory_id)
    speed = 0.2 + 0.05 * trajectory_id
    items = []
    t, next_odom, next_scan = 0.0, 0.0, 0.05
    dt_imu, dt_odom, dt_scan = 0.01, 0.05, 0.1
    while t <= duration:
        x = speed * max(0.0, t - 0.5)
        q = nq.quat_identity()
        items.append((trajectory_id, "imu", (t, nq.quat_rotate(nq.quat_conjugate(q), GRAVITY), np.zeros(3))))
        if t >= next_odom:
            items.append((trajectory_id, "odometry", (t, NpRigid3(np.array([x, 0, 0]) + rng.normal(0, 0.002, 3), q))))
            next_odom += dt_odom
        if t >= next_scan:
            pts = raycast_box_room_3d(np.array([x, 0, 0.0]), q, num_azimuth=64, num_elevation=16,
                                      noise_std=0.004, rng=rng)
            pts = pts[~np.isnan(pts[:, 0])]
            cloud = pad_timed_cloud(pts, np.zeros(len(pts), np.float32), 1024)
            items.append((trajectory_id, "range", TimedPointCloudData(
                time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud, width=64)))
            next_scan += dt_scan
        t = round(t + dt_imu, 6)
    return items


def run_server(batch: bool, n_traj: int = 3, mesh=None):
    srv = MapBuilderServer(MapBuilder(make_options()), "127.0.0.1:0",
                           batch_ct_windows=batch, ct_mesh=mesh)
    tids = [srv._handle_add_trajectory({})["trajectory_id"] for _ in range(n_traj)]
    streams = [sensor_items(tid) for tid in tids]
    # Interleave across trajectories (round-robin) so windows become ready
    # near-simultaneously — the shape a live multi-robot server sees.
    for group in zip(*streams):
        for item in group:
            srv._sensor_queue.put(item)
    srv.start()
    try:
        srv.wait_until_idle()
        results = {tid: list(srv._local_slam_results.get(tid, [])) for tid in tids}
    finally:
        srv.shutdown()
    return srv, results


@pytest.mark.slow
def test_batched_server_matches_serial_and_batches():
    srv_b, res_b = run_server(batch=True)
    assert srv_b.ct_batcher.batched_launches > 0, "no batched window launches"
    assert max(srv_b.ct_batcher.batch_sizes) >= 2, srv_b.ct_batcher.batch_sizes

    srv_s, res_s = run_server(batch=False)
    assert set(res_b) == set(res_s)
    for tid in res_b:
        assert len(res_b[tid]) == len(res_s[tid]) > 0, (
            tid, len(res_b[tid]), len(res_s[tid])
        )
        for (tb, pb), (ts, ps) in zip(res_b[tid], res_s[tid]):
            assert tb == ts
            # vmapped vs single solve: identical math, fp association may
            # differ per lane.
            np.testing.assert_allclose(pb.t, ps.t, atol=1e-4)


@pytest.mark.slow
def test_batched_server_per_point_mode_batches():
    """The accuracy-flagship per-point-unwarping mode must BATCH on the
    server (VERDICT r4 next #6 — it used to fall back to serial), with
    results equal to the serial server in the same mode (ref:
    optimizing_local_trajectory_builder.cc:513-926
    AddPerPointMatchingResiduals)."""
    global make_options
    base = make_options

    def pp_options():
        return replace_deep(
            base(),
            {
                "trajectory_builder_3d.optimizing_local_trajectory_builder.use_per_point_unwarping": True,
            },
        )

    make_options = pp_options
    try:
        srv_b, res_b = run_server(batch=True)
        assert srv_b.ct_batcher.batched_launches > 0, "per-point mode did not batch"
        assert max(srv_b.ct_batcher.batch_sizes) >= 2, srv_b.ct_batcher.batch_sizes
        srv_s, res_s = run_server(batch=False)
    finally:
        make_options = base
    assert set(res_b) == set(res_s)
    for tid in res_b:
        assert len(res_b[tid]) == len(res_s[tid]) > 0
        for (tb, pb), (ts, ps) in zip(res_b[tid], res_s[tid]):
            assert tb == ts
            np.testing.assert_allclose(pb.t, ps.t, atol=1e-4)


@pytest.mark.slow
def test_mesh_sharded_batcher_matches_serial():
    """Sharded CT serving on the production server path: the batcher
    solves each drained batch via solve_ct_windows_sharded over the
    8-virtual-device mesh (the one-host-many-chips topology)."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("graph",))
    srv_m, res_m = run_server(batch=True, mesh=mesh)
    assert srv_m.ct_batcher.batched_launches > 0
    srv_s, res_s = run_server(batch=False)
    for tid in res_m:
        assert len(res_m[tid]) == len(res_s[tid]) > 0
        for (tb, pb), (ts, ps) in zip(res_m[tid], res_s[tid]):
            assert tb == ts
            np.testing.assert_allclose(pb.t, ps.t, atol=1e-4)
