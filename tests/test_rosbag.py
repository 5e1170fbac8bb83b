"""rosbag v2 reader for the DRZ dataset topics (VERDICT r2 #9;
ref: /root/reference/README.md:31-37 — the dataset ships as ROS bags).
Fixtures are synthesized with the module's minimal writer, plus a
bz2-compressed chunk variant built by hand (real recorders chunk +
compress)."""

import bz2
import struct

import numpy as np

from hectorgrapher_tpu.io import rosbag
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def make_messages():
    rng = np.random.default_rng(0)
    clouds = [rng.uniform(-5, 5, (8 * 4, 3)).astype(np.float32) for _ in range(2)]
    msgs = []
    msgs.append(("/imu", "sensor_msgs/Imu", 0.05,
                 rosbag.encode_imu(0.05, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03])))
    msgs.append(("/odom", "nav_msgs/Odometry", 0.08,
                 rosbag.encode_odometry(0.08, NpRigid3(np.array([1.0, 2.0, 0.5])))))
    for k, pts in enumerate(clouds):
        msgs.append(("/points", "sensor_msgs/PointCloud2", 0.1 * (k + 1),
                     rosbag.encode_point_cloud2(0.1 * (k + 1), pts, width=8)))
    return msgs, clouds


class TestCodecs:
    def test_point_cloud2_round_trip(self):
        pts = np.random.default_rng(1).uniform(-3, 3, (24, 3)).astype(np.float32)
        stamp, out, width, _times = rosbag.decode_point_cloud2(
            rosbag.encode_point_cloud2(12.75, pts, width=6)
        )
        assert abs(stamp - 12.75) < 1e-6
        assert width == 6
        np.testing.assert_array_equal(out, pts)

    def test_imu_round_trip(self):
        stamp, accel, gyro = rosbag.decode_imu(
            rosbag.encode_imu(3.25, [0.1, -0.2, 9.81], [0.5, 0.0, -0.1])
        )
        assert abs(stamp - 3.25) < 1e-6
        np.testing.assert_allclose(accel, [0.1, -0.2, 9.81])
        np.testing.assert_allclose(gyro, [0.5, 0.0, -0.1])

    def test_odometry_round_trip_quaternion_order(self):
        q = np.array([0.9, 0.1, 0.2, 0.3])
        q = q / np.linalg.norm(q)
        stamp, pose = rosbag.decode_odometry(
            rosbag.encode_odometry(7.5, NpRigid3(np.array([1.0, -2.0, 0.25]), q))
        )
        np.testing.assert_allclose(pose.t, [1.0, -2.0, 0.25])
        np.testing.assert_allclose(pose.q, q, atol=1e-12)  # wxyz preserved


class TestBagStream:
    def test_write_read_round_trip(self, tmp_path):
        msgs, clouds = make_messages()
        path = str(tmp_path / "mini.bag")
        rosbag.write_bag(path, msgs)
        out = list(rosbag.read_bag(path))
        assert [(m.topic, m.msg_type) for m in out] == [(t, ty) for t, ty, _, _ in msgs]

        events = rosbag.read_bag_sequence(path)
        kinds = [e.kind for e in events]
        assert kinds == ["imu", "odometry", "range", "range"]
        np.testing.assert_array_equal(events[2].payload, clouds[0])
        accel, gyro = events[0].payload
        np.testing.assert_allclose(accel, [0.1, 0.2, 9.8])

    def test_bz2_chunked_bag(self, tmp_path):
        """Real recorders wrap records in bz2-compressed chunks."""
        msgs, clouds = make_messages()
        # Inner record stream (connections + messages), then one chunk.
        inner = bytearray()

        def rec(header, data):
            h = rosbag._emit_header(header)
            inner.extend(struct.pack("<I", len(h)))
            inner.extend(h)
            inner.extend(struct.pack("<I", len(data)))
            inner.extend(data)

        conn_by_topic = {}
        for topic, msg_type, stamp, raw in msgs:
            if topic not in conn_by_topic:
                conn = len(conn_by_topic)
                conn_by_topic[topic] = conn
                rec({b"op": bytes([rosbag.OP_CONNECTION]), b"conn": struct.pack("<I", conn),
                     b"topic": topic.encode()},
                    rosbag._emit_header({b"topic": topic.encode(), b"type": msg_type.encode()}))
            secs = int(stamp)
            nsecs = int(round((stamp - secs) * 1e9))
            rec({b"op": bytes([rosbag.OP_MESSAGE_DATA]),
                 b"conn": struct.pack("<I", conn_by_topic[topic]),
                 b"time": struct.pack("<II", secs, nsecs)}, raw)

        compressed = bz2.compress(bytes(inner))
        chunk_header = rosbag._emit_header(
            {b"op": bytes([rosbag.OP_CHUNK]), b"compression": b"bz2",
             b"size": struct.pack("<I", len(inner))}
        )
        blob = bytearray(rosbag.MAGIC)
        blob.extend(struct.pack("<I", len(chunk_header)))
        blob.extend(chunk_header)
        blob.extend(struct.pack("<I", len(compressed)))
        blob.extend(compressed)
        path = str(tmp_path / "chunked.bag")
        with open(path, "wb") as f:
            f.write(bytes(blob))

        events = rosbag.read_bag_sequence(path)
        assert [e.kind for e in events] == ["imu", "odometry", "range", "range"]
        np.testing.assert_array_equal(events[3].payload, clouds[1])

    def test_mapping_evaluation_consumes_bag(self, tmp_path):
        """End-to-end: a synthesized 2D bag drives the mapping-evaluation
        CLI (the DRZ entry path)."""
        from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
        from hectorgrapher_tpu.tools.cli import main as cli_main
        from hectorgrapher_tpu.transform import np_quat as nq

        msgs = []
        for k in range(10):
            t = 0.1 * (k + 1)
            x = 0.05 * k
            msgs.append(("/odom", "nav_msgs/Odometry", t,
                         rosbag.encode_odometry(t, NpRigid3(np.array([x, 0.0, 0.0])))))
            pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=360)
            pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
            msgs.append(("/points", "sensor_msgs/PointCloud2", t,
                         rosbag.encode_point_cloud2(t, pts)))
        path = str(tmp_path / "drive2d.bag")
        rosbag.write_bag(path, msgs)
        rc = cli_main([
            "mapping-evaluation", "--sequence_dir", path, "--duration", "1",
        ])
        assert rc == 0


class TestDrzFieldHandling:
    def test_ouster_uint32_nanosecond_time_field(self):
        """Ouster bags encode per-point 't' as uint32 NANOSECONDS; the
        decoder must convert to float seconds."""
        import struct

        n = 4
        pts = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
        t_ns = np.array([0, 25_000_000, 50_000_000, 99_000_000], np.uint32)
        point_step = 16
        out = struct.pack("<III", 0, 7, 0) + struct.pack("<I", 0)
        out += struct.pack("<II", 1, n)
        fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("t", 12, 6)]  # 6 = uint32
        out += struct.pack("<I", len(fields))
        for name, off, dtc in fields:
            out += struct.pack("<I", len(name)) + name.encode()
            out += struct.pack("<IBI", off, dtc, 1)
        out += b"\x00"
        out += struct.pack("<II", point_step, point_step * n)
        rows = np.zeros((n, point_step), np.uint8)
        rows[:, 0:12] = pts.view(np.uint8).reshape(n, 12)
        rows[:, 12:16] = t_ns.view(np.uint8).reshape(n, 4)
        payload = rows.tobytes()
        out += struct.pack("<I", len(payload)) + payload + b"\x01"

        stamp, decoded, width, times = rosbag.decode_point_cloud2(bytes(out))
        np.testing.assert_allclose(decoded, pts)
        np.testing.assert_allclose(times, t_ns.astype(np.float64) * 1e-9, atol=1e-9)

    def test_rich_encode_pads_non_divisible_width(self):
        """1000 points at width 64 -> 16 rows with NaN padding, not a
        crash; round-trips through the decoder."""
        n, width = 1000, 64
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        times = rng.uniform(0, 0.1, n).astype(np.float32)
        raw = rosbag.encode_point_cloud2(1.5, pts, width=width, times=times)
        stamp, decoded, w, t = rosbag.decode_point_cloud2(raw)
        assert w == width
        assert len(decoded) == 1024  # padded to the organized lattice
        np.testing.assert_allclose(decoded[:n], pts)
        assert np.isnan(decoded[n:]).all()
        np.testing.assert_allclose(t[:n], times, atol=1e-7)
