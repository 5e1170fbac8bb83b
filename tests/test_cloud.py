"""Client/server distributed mapping test
(ref: cloud/internal/client_server_test.cc — start a real server
in-process on localhost, connect real stubs, run SLAM through the full
RPC stack)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from hectorgrapher_tpu.cloud.client import MapBuilderStub
from hectorgrapher_tpu.cloud.server import MapBuilderServer
from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.map_builder import MapBuilder
from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3


@pytest.fixture
def server():
    options = replace_deep(
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
            "pose_graph.optimize_every_n_nodes": 0,
        },
    )
    srv = MapBuilderServer(MapBuilder(options), "127.0.0.1:0")
    srv.start()
    yield srv
    srv.shutdown()


def test_slam_through_rpc_stack(server):
    stub = MapBuilderStub(f"127.0.0.1:{server.port}")
    tid = stub.add_trajectory_builder()
    tb = stub.get_trajectory_builder(tid)

    for i in range(8):
        t = 0.1 * i
        x = 0.08 * i
        tb.add_odometry_data(t, NpRigid3(np.array([x, 0.0, 0.0]), nq.quat_identity()))
        pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=720)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 1024)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )

    server.wait_until_idle()
    poses = stub.pose_graph.get_trajectory_node_poses()
    assert len(poses) >= 6
    # Last node near ground truth.
    final = poses[-1]
    gt_x = 0.08 * round(final["time"] / 0.1)
    assert abs(final["translation"][0] - gt_x) < 0.1

    results = stub.get_local_slam_results(tid)
    assert len(results) >= 6

    constraints = stub.pose_graph.get_constraints()
    assert any(c["tag"] == "INTRA" for c in constraints)

    stub.pose_graph.run_final_optimization()
    l2g = stub.pose_graph.local_to_global(tid)
    assert np.isfinite(l2g.t).all()

    stub.finish_trajectory(tid)
    stub.close()


def test_state_write_load_through_rpc(server, tmp_path):
    stub = MapBuilderStub(f"127.0.0.1:{server.port}")
    tid = stub.add_trajectory_builder()
    tb = stub.get_trajectory_builder(tid)
    for i in range(4):
        t = 0.1 * i
        tb.add_odometry_data(t, NpRigid3(np.array([0.05 * i, 0, 0]), nq.quat_identity()))
        pts = raycast_rect_room_2d(np.array([0.05 * i, 0.0]), 0.0, num_rays=720)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 1024)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )
    path = str(tmp_path / "server_state.npz")
    stub.write_state(path)
    import os

    assert os.path.getsize(path) > 1000
    stub.close()


def test_uplink_federation(tmp_path):
    """(ref: client_server_test.cc federation path — a serving server
    uploads sensor batches to an uplink server that runs its own SLAM)."""
    def make_opts():
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
                "pose_graph.optimize_every_n_nodes": 0,
            },
        )

    uplink = MapBuilderServer(MapBuilder(make_opts()), "127.0.0.1:0")
    uplink.start()
    serving = MapBuilderServer(
        MapBuilder(make_opts()), "127.0.0.1:0", uplink_address=f"127.0.0.1:{uplink.port}"
    )
    serving.start()
    try:
        stub = MapBuilderStub(f"127.0.0.1:{serving.port}")
        tid = stub.add_trajectory_builder()
        tb = stub.get_trajectory_builder(tid)
        for i in range(6):
            t = 0.1 * i
            x = 0.08 * i
            tb.add_odometry_data(t, NpRigid3(np.array([x, 0.0, 0.0]), nq.quat_identity()))
            pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=720)
            pts = pts[~np.isnan(pts[:, 0])]
            cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 1024)
            tb.add_range_data(
                TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
            )
        serving.wait_until_idle()
        serving.uploader.wait_until_idle()
        time.sleep(1.0)
        uplink.wait_until_idle()
        assert serving.uploader.num_batches_uploaded >= 1

        # Result-based federation (ref: local_trajectory_uploader.h:32-66 +
        # global_trajectory_builder.cc:118-123): the uplink must inject the
        # serving server's local-SLAM RESULTS, running ZERO local-SLAM
        # solves of its own.
        from hectorgrapher_tpu.mapping.map_builder import UplinkTrajectoryBuilder

        up_builder = uplink.map_builder.get_trajectory_builder(0)
        assert isinstance(up_builder, UplinkTrajectoryBuilder)
        assert up_builder.num_results_injected >= 4

        # The uplink's nodes are exactly the serving server's results:
        # local poses identical (no re-solve, no divergence)...
        s_nodes = serving.map_builder.pose_graph.nodes
        u_nodes = uplink.map_builder.pose_graph.nodes
        assert len(u_nodes) == len(s_nodes) >= 4
        for sn, un in zip(s_nodes, u_nodes):
            assert sn.time == un.time
            np.testing.assert_allclose(un.local_pose.t, sn.local_pose.t, atol=1e-9)
            np.testing.assert_allclose(un.local_pose.q, sn.local_pose.q, atol=1e-9)
        # ...and the global poses match the direct run's.
        for sn, un in zip(s_nodes, u_nodes):
            np.testing.assert_allclose(un.global_pose.t, sn.global_pose.t, atol=1e-6)

        # Finished submaps were re-instantiated server-side with their grid
        # content (ref: submap_controller.h UpdateSubmap); unfinished ones
        # are metadata placeholders.
        s_submaps = serving.map_builder.pose_graph.submaps
        u_submaps = uplink.map_builder.pose_graph.submaps
        assert len(u_submaps) == len(s_submaps)
        for ss, us in zip(s_submaps, u_submaps):
            np.testing.assert_allclose(us.submap.local_pose.t, ss.submap.local_pose.t, atol=1e-9)
            if ss.finished:
                np.testing.assert_allclose(
                    np.asarray(us.submap.grid.known), np.asarray(ss.submap.grid.known)
                )
        stub.close()
    finally:
        serving.shutdown()
        uplink.shutdown()


def test_wire_rejects_code_execution():
    """The RPC deserializer must refuse pickles referencing anything
    outside the data-container whitelist — the classic __reduce__ ->
    os.system exploit (the reference's proto wire format has no such
    surface; ref: cloud/proto/map_builder_service.proto)."""
    import pickle

    import pytest as _pytest

    from hectorgrapher_tpu.cloud import wire

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    with _pytest.raises(wire.WirePayloadError):
        wire.loads(pickle.dumps(Evil()))
    with _pytest.raises(wire.WirePayloadError):
        wire.loads(pickle.dumps({"payload": [Evil()]}))  # nested

    # Legitimate payloads round-trip.
    from hectorgrapher_tpu.sensor.types import TimedPointCloud, TimedPointCloudData

    payload = {
        "trajectory_id": 3,
        "kind": "range",
        "payload": TimedPointCloudData(
            time=0.5,
            origin=np.zeros(3, np.float32),
            ranges=TimedPointCloud(
                jnp.zeros((4, 3)), jnp.zeros(4), jnp.ones(4, bool)
            ),
            width=0,
        ),
        "pose": NpRigid3(np.zeros(3)),
    }
    out = wire.loads(wire.dumps(payload))
    assert out["trajectory_id"] == 3
    assert out["payload"].ranges.positions.shape == (4, 3)


def test_streaming_local_slam_results(server):
    """Server-streaming subscription delivers results live and ends on
    FinishTrajectory (ref: client_server_test.cc
    TestAddSensorDataRange + local SLAM subscription)."""
    import threading

    stub = MapBuilderStub(f"127.0.0.1:{server.port}")
    tid = stub.add_trajectory_builder()
    tb = stub.get_trajectory_builder(tid)

    received = []
    done = threading.Event()

    def consume():
        for msg in stub.receive_local_slam_results(tid):
            received.append(msg)
        done.set()

    consumer = threading.Thread(target=consume, daemon=True)
    consumer.start()

    for i in range(6):
        t = 0.1 * i
        x = 0.08 * i
        tb.add_odometry_data(t, NpRigid3(np.array([x, 0.0, 0.0]), nq.quat_identity()))
        pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=720)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 1024)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )

    server.wait_until_idle()
    stub.finish_trajectory(tid)
    assert done.wait(timeout=10.0), "stream did not terminate after FinishTrajectory"
    assert len(received) >= 1
    assert all("time" in m and "local_pose" in m for m in received)
    times = [float(m["time"]) for m in received]
    assert times == sorted(times)


def test_query_and_lifecycle_rpcs(server):
    """The reference's remaining query/lifecycle RPCs
    (ref: map_builder_service.proto GetSubmap/GetAllSubmapPoses/
    GetTrajectoryStates/GetLandmarkPoses/SetLandmarkPose/
    IsTrajectoryFinished/IsTrajectoryFrozen/DeleteTrajectory/
    ReceiveGlobalSlamOptimizations)."""
    import threading

    stub = MapBuilderStub(f"127.0.0.1:{server.port}")
    tid = stub.add_trajectory_builder()
    tb = stub.get_trajectory_builder(tid)
    for i in range(10):
        t = 0.1 * i
        tb.add_odometry_data(t, NpRigid3(np.array([0.06 * i, 0, 0]), nq.quat_identity()))
        pts = raycast_rect_room_2d(np.array([0.06 * i, 0.0]), 0.0, num_rays=720)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts.astype(np.float32), np.zeros(len(pts), np.float32), 1024)
        tb.add_range_data(
            TimedPointCloudData(time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32), ranges=cloud)
        )
    server.wait_until_idle()

    # Submap queries.
    submap_poses = stub.pose_graph.get_all_submap_poses()
    assert len(submap_poses) >= 1
    sub = stub.get_submap(0)
    assert sub["trajectory_id"] == tid
    assert "grid" in sub and sub["grid"]["type"] == "probability"
    from hectorgrapher_tpu.cloud.local_slam_result import _unpack_grid

    grid = _unpack_grid(sub["grid"])
    assert grid.log_odds.shape[0] > 0
    assert stub.get_submap(999).get("error")

    # Trajectory state queries.
    assert stub.pose_graph.trajectory_states()[tid] == "ACTIVE"
    assert not stub.pose_graph.is_trajectory_finished(tid)
    assert not stub.pose_graph.is_trajectory_frozen(tid)

    # Landmarks: set + read back.
    stub.pose_graph.set_landmark_pose("door_1", NpRigid3(np.array([1.0, 2.0, 0.0])))
    poses = stub.pose_graph.landmark_poses()
    assert "door_1" in poses
    np.testing.assert_allclose(poses["door_1"].t[:2], [1.0, 2.0])

    # Global-optimization stream: subscribe, trigger, expect one message.
    stream = stub.receive_global_slam_optimizations()
    got = []

    def reader():
        for msg in stream:
            got.append(msg)
            break

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    time.sleep(0.2)
    stub.pose_graph.run_final_optimization()
    th.join(timeout=10.0)
    assert got and got[0]["num_optimizations"] >= 1
    stream.cancel()

    stub.finish_trajectory(tid)
    assert stub.pose_graph.is_trajectory_finished(tid)

    # Delete: trajectory data leaves the graph; state records DELETED.
    stub.delete_trajectory(tid)
    assert stub.pose_graph.trajectory_states()[tid] == "DELETED"
    assert stub.pose_graph.get_all_submap_poses() == []
    stub.close()


class TestWireHardening:
    """Malformed-payload fuzzing across the whole RPC surface (VERDICT r2
    #10): every handler must reject hostile bytes with an RPC error — never
    crash the server or execute code — and the server must keep serving."""

    def _payloads(self):
        import pickle

        class Exploit:
            def __reduce__(self):
                import os

                return (os.system, ("echo pwned",))

        deep = [1]
        cursor = deep
        for _ in range(200):
            nxt = [1]
            cursor.append(nxt)
            cursor = nxt
        return {
            "random_bytes": b"\x99\xf3garbage-not-a-pickle\x00\x01",
            "truncated_pickle": pickle.dumps({"a": 1})[:-3],
            "forbidden_type": pickle.dumps(Exploit()),
            "nesting_bomb": pickle.dumps(deep),
            "wrong_schema": pickle.dumps(12345),
            "empty": b"",
        }

    def test_every_handler_survives_malformed_payloads(self, server):
        import grpc

        from hectorgrapher_tpu.cloud import wire
        from hectorgrapher_tpu.cloud.server import SERVICE

        channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")
        identity = lambda b: b
        failures = []
        for name in server.method_names:
            for kind, payload in self._payloads().items():
                streaming = name.startswith("Receive")
                if streaming:
                    call = channel.unary_stream(
                        f"/{SERVICE}/{name}",
                        request_serializer=identity,
                        response_deserializer=identity,
                        _registered_method=False,
                    )
                else:
                    call = channel.unary_unary(
                        f"/{SERVICE}/{name}",
                        request_serializer=identity,
                        response_deserializer=identity,
                        _registered_method=False,
                    )
                try:
                    result = call(payload, timeout=10)
                    if streaming:
                        list(result)
                    # A handler MAY tolerate a schema-valid payload (e.g.
                    # int request for a no-arg RPC); what it must never do
                    # is crash the server — checked below.
                except grpc.RpcError:
                    pass  # expected: decode or handler rejection
                except Exception as e:  # noqa: BLE001
                    failures.append((name, kind, repr(e)))
        assert not failures, failures

        # The server is still alive and serving correct requests.
        stub = MapBuilderStub(f"127.0.0.1:{server.port}")
        tid = stub.add_trajectory_builder()
        assert isinstance(tid, int)

    def test_wire_caps(self):
        import pickle

        import pytest as _pytest

        from hectorgrapher_tpu.cloud import wire

        with _pytest.raises(wire.WirePayloadError):
            wire.loads(b"x" * (wire.MAX_WIRE_BYTES + 1))
        deep = [1]
        cursor = deep
        for _ in range(wire.MAX_DEPTH + 10):
            nxt = [1]
            cursor.append(nxt)
            cursor = nxt
        with _pytest.raises(wire.WirePayloadError):
            wire.loads(pickle.dumps(deep))
        # Well-formed payloads still pass.
        out = wire.loads(wire.dumps({"a": np.arange(10)}))
        np.testing.assert_array_equal(out["a"], np.arange(10))
