"""Interop tests: protobuf wire codec, pbstream container, ground-truth
relations, real-data file readers, and state format migration.

The protobuf tests verify against google.protobuf (runtime message
factory) — a genuinely independent encoder — so protowire's bytes are
bit-compatible with what the reference's C++ protobuf produces
(ref: ground_truth/proto/relations.proto, transform/proto/transform.proto,
io/proto_stream.cc container framing).
"""

import os

import numpy as np
import pytest

from hectorgrapher_tpu.io import pbstream, protowire as pw
from hectorgrapher_tpu.io.readers import (
    read_cloud_file,
    read_imu_csv,
    read_odometry_csv,
    read_pcd,
    read_ply,
    read_sequence_dir,
    write_ply,
)
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def _build_reference_protos():
    """Build Relation/GroundTruth/Rigid3d message classes with
    google.protobuf's runtime factory, mirroring relations.proto +
    transform.proto field numbers exactly."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "test_relations.proto"
    fdp.package = "testref"
    fdp.syntax = "proto3"

    def add_msg(name, fields):
        msg = fdp.message_type.add()
        msg.name = name
        for fname, number, ftype, type_name in fields:
            f = msg.field.add()
            f.name = fname
            f.number = number
            f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED if fname == "relation" else descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
            f.type = ftype
            if type_name:
                f.type_name = f".testref.{type_name}"

    T = descriptor_pb2.FieldDescriptorProto
    add_msg("Vector3d", [("x", 1, T.TYPE_DOUBLE, None), ("y", 2, T.TYPE_DOUBLE, None), ("z", 3, T.TYPE_DOUBLE, None)])
    add_msg("Quaterniond", [("x", 1, T.TYPE_DOUBLE, None), ("y", 2, T.TYPE_DOUBLE, None), ("z", 3, T.TYPE_DOUBLE, None), ("w", 4, T.TYPE_DOUBLE, None)])
    add_msg("Rigid3d", [("translation", 1, T.TYPE_MESSAGE, "Vector3d"), ("rotation", 2, T.TYPE_MESSAGE, "Quaterniond")])
    add_msg("Relation", [
        ("timestamp1", 1, T.TYPE_INT64, None),
        ("timestamp2", 2, T.TYPE_INT64, None),
        ("expected", 3, T.TYPE_MESSAGE, "Rigid3d"),
        ("covered_distance", 4, T.TYPE_DOUBLE, None),
    ])
    add_msg("GroundTruth", [("relation", 1, T.TYPE_MESSAGE, "Relation")])

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    get = lambda n: message_factory.GetMessageClass(pool.FindMessageTypeByName(f"testref.{n}"))
    return get("Relation"), get("GroundTruth"), get("Rigid3d")


class TestProtoWire:
    def test_rigid3d_matches_google_protobuf(self):
        _, _, Rigid3d = _build_reference_protos()
        pose = NpRigid3(np.array([1.5, -2.25, 0.125]), np.array([0.5, 0.5, -0.5, 0.5]))
        ours = pw.encode_rigid3d(pose)
        theirs = Rigid3d()
        theirs.translation.x, theirs.translation.y, theirs.translation.z = 1.5, -2.25, 0.125
        theirs.rotation.w, theirs.rotation.x = 0.5, 0.5
        theirs.rotation.y, theirs.rotation.z = -0.5, 0.5
        assert ours == theirs.SerializeToString()
        # And our decoder reads google.protobuf's bytes.
        decoded = pw.decode_rigid3d(theirs.SerializeToString())
        np.testing.assert_allclose(decoded.t, pose.t)
        np.testing.assert_allclose(decoded.q, pose.q)

    def test_ground_truth_file_round_trip_with_google_protobuf(self, tmp_path):
        RelationMsg, GroundTruthMsg, _ = _build_reference_protos()
        path = str(tmp_path / "relations.pb")
        # Write with google.protobuf (standing in for the reference tool)...
        gt = GroundTruthMsg()
        for i in range(3):
            r = gt.relation.add()
            r.timestamp1 = 637_000_000_000_000_000 + i * 10_000_000
            r.timestamp2 = r.timestamp1 + 5_000_000
            r.expected.translation.x = 0.1 * i
            r.expected.rotation.w = 1.0
            r.covered_distance = 12.5 * i
        with open(path, "wb") as f:
            f.write(gt.SerializeToString())
        # ...read with ours.
        relations = pbstream.read_ground_truth(path)
        assert len(relations) == 3
        assert relations[1].timestamp1 == 637_000_000_000_000_000 + 10_000_000
        assert relations[2].covered_distance == 25.0
        np.testing.assert_allclose(relations[2].expected.t, [0.2, 0, 0])
        # Write with ours, parse with google.protobuf.
        out = str(tmp_path / "ours.pb")
        pbstream.write_ground_truth(out, relations)
        parsed = GroundTruthMsg()
        with open(out, "rb") as f:
            parsed.ParseFromString(f.read())
        assert len(parsed.relation) == 3
        assert parsed.relation[2].covered_distance == 25.0

    def test_varint_signed(self):
        buf = pw.emit_int(1, -5)
        ((field, _, value),) = list(pw.iter_fields(buf))
        assert field == 1 and pw._signed64(value) == -5


class TestPbStream:
    def _make_state(self):
        state = pbstream.PbState(format_version=2)
        for i in range(4):
            state.nodes.append(
                pbstream.PbNodePose(
                    trajectory_id=0,
                    node_index=i,
                    timestamp=637_000_000_000_000_000 + i * 1_000_000,
                    pose=NpRigid3(np.array([0.5 * i, 0.0, 0.0])),
                )
            )
        state.submap_poses.append(
            {"trajectory_id": 0, "submap_index": 0, "pose": NpRigid3(np.zeros(3))}
        )
        state.constraints.append(
            pbstream.PbConstraint(
                submap_trajectory_id=0, submap_index=0,
                node_trajectory_id=0, node_index=3,
                relative_pose=NpRigid3(np.array([1.5, 0, 0])),
                translation_weight=100.0, rotation_weight=10.0, tag="INTER_SUBMAP",
            )
        )
        state.landmark_poses["lm_a"] = NpRigid3(np.array([0, 1, 0]))
        return state

    def test_container_round_trip(self, tmp_path):
        path = str(tmp_path / "x.pbstream")
        records = [b"first-record", b"second" * 100, b""]
        pbstream.write_records(path, records)
        assert list(pbstream.read_records(path)) == records

    def test_bad_magic_rejected(self, tmp_path):
        path = str(tmp_path / "bad.pbstream")
        with open(path, "wb") as f:
            f.write(b"\x00" * 16)
        with pytest.raises(ValueError, match="magic"):
            list(pbstream.read_records(path))

    def test_state_round_trip(self, tmp_path):
        state = self._make_state()
        path = str(tmp_path / "state.pbstream")
        pbstream.write_state(path, state)
        loaded = pbstream.read_state(path)
        assert loaded.format_version == 2
        assert len(loaded.nodes) == 4
        assert loaded.nodes[2].node_index == 2
        assert loaded.nodes[2].timestamp == state.nodes[2].timestamp
        np.testing.assert_allclose(loaded.nodes[2].pose.t, [1.0, 0, 0])
        assert len(loaded.constraints) == 1
        c = loaded.constraints[0]
        assert c.tag == "INTER_SUBMAP" and c.node_index == 3
        np.testing.assert_allclose(c.relative_pose.t, [1.5, 0, 0])
        assert c.translation_weight == 100.0
        np.testing.assert_allclose(loaded.landmark_poses["lm_a"].t, [0, 1, 0])
        assert loaded.record_counts == {"pose_graph": 1}

    def test_autogenerate_relations_from_pbstream(self, tmp_path):
        from hectorgrapher_tpu.evaluation.metrics import (
            autogenerate_relations_from_pbstream_state,
        )

        state = self._make_state()
        relations = autogenerate_relations_from_pbstream_state(
            state, min_covered_distance=0.5,
            outlier_threshold_meters=10.0, outlier_threshold_radians=3.0,
        )
        assert len(relations) == 1
        np.testing.assert_allclose(relations[0].expected.t, [1.5, 0, 0])


class TestCloudFileReaders:
    def test_ply_binary_round_trip(self, tmp_path):
        pts = np.random.default_rng(0).normal(0, 1, (57, 3)).astype(np.float32)
        path = str(tmp_path / "cloud_1.250.ply")
        write_ply(path, pts)
        out = read_cloud_file(path)
        np.testing.assert_allclose(out, pts)

    def test_ply_ascii(self, tmp_path):
        path = str(tmp_path / "a.ply")
        with open(path, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float intensity\nend_header\n"
                "1.0 2.0 3.0 0.5\n4.0 5.0 6.0 0.25\n"
            )
        d = read_ply(path)
        np.testing.assert_allclose(d["intensity"], [0.5, 0.25])
        np.testing.assert_allclose(read_cloud_file(path), [[1, 2, 3], [4, 5, 6]])

    def test_pcd_ascii_and_binary(self, tmp_path):
        # The PointXYZIR layout mapping_evaluation.cc consumes via PCL.
        apath = str(tmp_path / "a.pcd")
        with open(apath, "w") as f:
            f.write(
                "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z intensity ring\n"
                "SIZE 4 4 4 4 2\nTYPE F F F F U\nCOUNT 1 1 1 1 1\n"
                "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\nDATA ascii\n"
                "1 2 3 10 0\n4 5 6 20 1\n"
            )
        d = read_pcd(apath)
        np.testing.assert_allclose(d["ring"], [0, 1])
        np.testing.assert_allclose(read_cloud_file(apath), [[1, 2, 3], [4, 5, 6]])

        bpath = str(tmp_path / "b.pcd")
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("intensity", "<f4"), ("ring", "<u2")])
        rows = np.array([(1, 2, 3, 10, 0), (4, 5, 6, 20, 1)], dtype=dtype)
        with open(bpath, "wb") as f:
            f.write(
                b"VERSION 0.7\nFIELDS x y z intensity ring\nSIZE 4 4 4 4 2\n"
                b"TYPE F F F F U\nCOUNT 1 1 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA binary\n"
            )
            f.write(rows.tobytes())
        np.testing.assert_allclose(read_cloud_file(bpath), [[1, 2, 3], [4, 5, 6]])

    def test_sensor_csvs_and_sequence_dir(self, tmp_path):
        np.savetxt(tmp_path / "imu.csv", [[0.1, 0, 0, 9.81, 0.01, 0, 0]], delimiter=",")
        np.savetxt(
            tmp_path / "odometry.csv", [[0.15, 1, 2, 3, 1, 0, 0, 0]], delimiter=","
        )
        write_ply(str(tmp_path / "scan_0.200.ply"), np.zeros((5, 3), np.float32))
        write_ply(str(tmp_path / "scan_0.100.ply"), np.zeros((4, 3), np.float32))
        imu = read_imu_csv(str(tmp_path / "imu.csv"))
        assert imu[0].payload[0][2] == 9.81
        odom = read_odometry_csv(str(tmp_path / "odometry.csv"))
        np.testing.assert_allclose(odom[0].payload.t, [1, 2, 3])
        events = read_sequence_dir(str(tmp_path))
        assert [e.kind for e in events] == ["imu", "range", "odometry", "range"]
        assert [e.time for e in events] == [0.1, 0.1, 0.15, 0.2]


class TestStateMigration:
    def _make_v1_state(self, tmp_path):
        """Build a real 3D state, strip submap histograms + mark version 1 —
        the exact shape of a pre-histogram state file
        (ref: serialization_format_migration.cc v1->v2)."""
        import json

        from hectorgrapher_tpu.common.config import MapBuilderOptions
        from hectorgrapher_tpu.io.serialization import save_state
        from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
            Constraint,
            PgNode,
            PgSubmap,
            PoseGraph3D,
        )
        from hectorgrapher_tpu.mapping.submap_3d import Submap3D

        pg = PoseGraph3D(MapBuilderOptions().pose_graph)
        submap = Submap3D(
            local_pose=NpRigid3(np.zeros(3)),
            high_resolution_grid=make_tsdf_grid(0.1, (16, 16, 16), 0.3, 128.0),
            low_resolution_grid=make_tsdf_grid(0.45, (8, 8, 8), 1.35, 128.0),
            rotational_histogram=np.zeros(16, np.float32),
            insertion_finished=True,
        )
        pg.submaps.append(
            PgSubmap(submap=submap, global_pose=NpRigid3(np.zeros(3)), finished=True, submap_id=0)
        )
        for i in range(2):
            pg.nodes.append(
                PgNode(
                    time=float(i), local_pose=NpRigid3(np.array([i * 0.1, 0, 0])),
                    global_pose=NpRigid3(np.array([i * 0.1, 0, 0])),
                    histogram=np.full(16, 1.0 + i, np.float32), node_id=i,
                )
            )
            pg.constraints.append(Constraint(0, i, NpRigid3(np.zeros(3)), 1.0, 1.0, "INTRA"))
        v2_path = str(tmp_path / "v2_orig.npz")
        save_state(pg, v2_path)

        # Downgrade: drop histograms, stamp version 1.
        with np.load(v2_path, allow_pickle=False) as data:
            arrays = {k: data[k] for k in data.files if k != "__index__"}
            index = json.loads(bytes(data["__index__"]).decode())
        arrays.pop("submap0_histogram", None)
        index["version"] = 1
        arrays["__index__"] = np.frombuffer(json.dumps(index).encode(), dtype=np.uint8)
        v1_path = str(tmp_path / "v1.npz")
        np.savez_compressed(v1_path, **arrays)
        return v1_path

    def test_migrate_v1_to_v2(self, tmp_path):
        import json

        from hectorgrapher_tpu.io.serialization import migrate_state_v1_to_v2

        v1 = self._make_v1_state(tmp_path)
        out = str(tmp_path / "v2.npz")
        assert migrate_state_v1_to_v2(v1, out) == 1
        with np.load(out, allow_pickle=False) as data:
            index = json.loads(bytes(data["__index__"]).decode())
            assert index["version"] == 2
            # Sum of the two INTRA nodes' histograms (1.0 + 2.0 per bin).
            np.testing.assert_allclose(data["submap0_histogram"], np.full(16, 3.0))

    def test_migrate_rejects_current_version(self, tmp_path):
        import json

        from hectorgrapher_tpu.io.serialization import migrate_state_v1_to_v2

        v1 = self._make_v1_state(tmp_path)
        out = str(tmp_path / "v2.npz")
        migrate_state_v1_to_v2(v1, out)
        with pytest.raises(ValueError, match="already at version"):
            migrate_state_v1_to_v2(out, str(tmp_path / "v3.npz"))

    def test_load_state_migrates_v1_in_memory(self, tmp_path):
        from hectorgrapher_tpu.common.config import MapBuilderOptions
        from hectorgrapher_tpu.io.serialization import load_state
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph3D

        v1 = self._make_v1_state(tmp_path)
        pg = PoseGraph3D(MapBuilderOptions().pose_graph)
        load_state(pg, v1, load_frozen_state=False)
        np.testing.assert_allclose(
            pg.submaps[0].submap.rotational_histogram, np.full(16, 3.0)
        )
