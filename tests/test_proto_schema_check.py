"""Machine-check pbstream interop against the reference's REAL proto
schemas (VERDICT r3 #3).

The hand-built descriptors in test_pbstream_state.py encode the
builder's own reading of the reference's .proto files — a transcription
error there would pass its own tests and still fail against the real
serializer. Here protoc compiles
/root/reference/cartographer/mapping/proto/serialization.proto (with all
transitive imports) into a descriptor set AT TEST TIME, and:

  1. every record write_pbstream_state emits must parse as the GENERATED
     SerializationHeader / SerializedData classes with ZERO unknown
     fields anywhere in the message tree (2D and 3D states) — any field
     number / wire type / nesting drift in io/pbstream_state.py fails
     this immediately;
  2. a stream RE-BUILT by protobuf itself (parse our records with the
     generated classes, re-serialize canonically — different field
     ordering / varint choices than our encoder — and make the
     AllTrajectoryBuilderOptions entries NON-EMPTY, the shape the
     reference's AddTrajectoryForDeserialization receives, ref:
     map_builder.cc:237-252) must load through load_pbstream_state with
     the same poses and constraints.
"""

import shutil
import subprocess

import numpy as np
import pytest

from hectorgrapher_tpu.io.pbstream import read_records, write_records
from hectorgrapher_tpu.io.pbstream_state import load_pbstream_state, write_pbstream_state
from hectorgrapher_tpu.transform.np_quat import NpRigid3

REFERENCE = "/root/reference"
SERIALIZATION_PROTO = "cartographer/mapping/proto/serialization.proto"


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    """protoc-generated message classes from the reference's own protos
    (descriptor-set + dynamic factory — --python_out chokes on the
    reference's `2d`/`3d` package directories)."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not installed")
    ref = f"{REFERENCE}/{SERIALIZATION_PROTO}"
    import os

    if not os.path.exists(ref):
        pytest.skip("reference protos unavailable")
    out = tmp_path_factory.mktemp("protos") / "carto.desc"
    subprocess.run(
        [
            "protoc",
            "-I",
            REFERENCE,
            f"--descriptor_set_out={out}",
            "--include_imports",
            ref,
        ],
        check=True,
    )
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fds = descriptor_pb2.FileDescriptorSet.FromString(out.read_bytes())
    pool = descriptor_pool.DescriptorPool()
    for f in fds.file:
        pool.Add(f)

    def cls(name):
        return message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"cartographer.mapping.proto.{name}")
        )

    return cls


def _assert_no_unknown_fields(msg, path=""):
    """Recursively assert the parsed tree carried no unknown fields —
    i.e. every byte our encoder emitted landed on a field the reference
    schema actually defines."""
    from google.protobuf.unknown_fields import UnknownFieldSet

    unknown = UnknownFieldSet(msg)
    assert len(unknown) == 0, (
        f"unknown fields at {path or '<root>'}: "
        f"{[(u.field_number, u.wire_type) for u in unknown]}"
    )
    for fd, value in msg.ListFields():
        if fd.type != fd.TYPE_MESSAGE:
            continue
        if fd.label == fd.LABEL_REPEATED:
            if fd.message_type.GetOptions().map_entry:
                vf = fd.message_type.fields_by_name["value"]
                if vf.type == vf.TYPE_MESSAGE:
                    for k, v in value.items():
                        _assert_no_unknown_fields(v, f"{path}.{fd.name}[{k!r}]")
                continue
            for i, item in enumerate(value):
                _assert_no_unknown_fields(item, f"{path}.{fd.name}[{i}]")
        else:
            _assert_no_unknown_fields(value, f"{path}.{fd.name}")


def _build_graph_2d():
    from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph2D
    from hectorgrapher_tpu.mapping.submap_2d import Submap2D
    from hectorgrapher_tpu.sensor.types import pad_cloud
    from tests.test_pbstream_state import random_probability_grid

    options = replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.constraint_builder.sampling_ratio": 0.0,
        },
    ).pose_graph
    pg = PoseGraph2D(options)
    grid = random_probability_grid(seed=3, shape=(48, 48))
    submap = Submap2D(local_pose=NpRigid3(np.zeros(3)), grid=grid, insertion_finished=True)
    rng = np.random.default_rng(11)
    for k in range(3):
        cloud = pad_cloud(rng.uniform(-3, 3, (40, 3)).astype(np.float32), 64)
        pg.add_node(
            PgNode(
                time=0.1 * k,
                local_pose=NpRigid3(np.array([0.1 * k, 0.0, 0.0])),
                global_pose=NpRigid3.identity(),
                cloud=cloud,
            ),
            [submap],
        )
    return pg


def _build_graph_3d():
    from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph3D
    from hectorgrapher_tpu.mapping.submap_3d import Submap3D
    from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
    from hectorgrapher_tpu.sensor.types import pad_cloud

    options = replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.constraint_builder.sampling_ratio": 0.0,
        },
    ).pose_graph
    pg = PoseGraph3D(options, histogram_size=16)
    rng = np.random.default_rng(12)
    import jax.numpy as jnp

    hi = make_tsdf_grid(0.1, (16, 16, 8), truncation_distance=0.3, max_weight=100.0)
    hi = hi._replace(
        tsd=jnp.asarray(rng.uniform(-0.3, 0.3, hi.tsd.shape).astype(np.float32)),
        weight=jnp.asarray(rng.uniform(0, 10, hi.tsd.shape).astype(np.float32)),
    )
    lo = make_tsdf_grid(0.45, (8, 8, 4), truncation_distance=1.0, max_weight=100.0)
    submap = Submap3D(
        local_pose=NpRigid3(np.zeros(3)),
        high_resolution_grid=hi,
        low_resolution_grid=lo,
        rotational_histogram=rng.uniform(0, 1, 16).astype(np.float32),
        num_range_data=1,
        insertion_finished=False,  # skip matcher build (grids are tiny)
    )
    for k in range(2):
        pg.add_node(
            PgNode(
                time=0.1 * k,
                local_pose=NpRigid3(np.array([0.1 * k, 0.0, 0.0])),
                global_pose=NpRigid3.identity(),
                high_cloud=pad_cloud(rng.uniform(-3, 3, (30, 3)).astype(np.float32), 32),
                low_cloud=pad_cloud(rng.uniform(-3, 3, (10, 3)).astype(np.float32), 16),
                histogram=rng.uniform(0, 1, 16).astype(np.float32),
                gravity_alignment=np.array([1.0, 0.0, 0.0, 0.0]),
            ),
            [submap],
        )
    pg.submaps[0].finished = True  # serialized as a finished submap
    return pg


class TestWrittenStateMatchesReferenceSchema:
    def _check(self, pg, tmp_path, expect):
        path = str(tmp_path / "state.pbstream")
        write_pbstream_state(pg, path)
        return self._check_path(path, expect)

    def _check_path(self, path, expect):
        Header = self._cls("SerializationHeader")
        Data = self._cls("SerializedData")
        seen = {}
        records = list(read_records(path))
        header = Header.FromString(records[0])
        _assert_no_unknown_fields(header, "header")
        assert header.format_version == 2
        parsed = []
        for i, rec in enumerate(records[1:]):
            msg = Data.FromString(rec)
            _assert_no_unknown_fields(msg, f"record[{i + 1}]")
            kind = msg.WhichOneof("data")
            assert kind is not None, f"record {i + 1} empty under reference schema"
            seen[kind] = seen.get(kind, 0) + 1
            parsed.append(msg)
        for kind, count in expect.items():
            assert seen.get(kind) == count, (kind, seen)
        return parsed

    def test_2d_state(self, generated, tmp_path):
        self._cls = generated
        pg = _build_graph_2d()
        parsed = self._check(pg, tmp_path, {
            "pose_graph": 1,
            "all_trajectory_builder_options": 1,
            "submap": 1,
            "node": 3,
        })
        by_kind = {m.WhichOneof("data"): m for m in parsed}
        pgm = by_kind["pose_graph"].pose_graph
        assert len(pgm.constraint) == 3
        assert len(pgm.trajectory) == 1
        assert len(pgm.trajectory[0].node) == 3
        assert len(pgm.trajectory[0].submap) == 1
        sub = by_kind["submap"].submap
        assert sub.submap_2d.grid.HasField("probability_grid_2d")
        assert len(sub.submap_2d.grid.cells) > 0
        node = by_kind["node"].node
        assert node.node_data.timestamp >= 0
        assert node.node_data.filtered_gravity_aligned_point_cloud.num_points == 40

    def test_3d_state(self, generated, tmp_path):
        self._cls = generated
        pg = _build_graph_3d()
        parsed = self._check(pg, tmp_path, {
            "pose_graph": 1,
            "all_trajectory_builder_options": 1,
            "submap": 1,
            "node": 2,
            "trajectory_data": 1,
        })
        by_kind = {m.WhichOneof("data"): m for m in parsed}
        sub = by_kind["submap"].submap
        assert sub.submap_3d.high_resolution_hybrid_grid_tsdf.resolution > 0
        assert len(sub.submap_3d.high_resolution_hybrid_grid_tsdf.values_tsd) > 0
        node = by_kind["node"].node
        assert node.node_data.high_resolution_point_cloud.num_points == 30
        assert len(node.node_data.rotational_scan_matcher_histogram) == 16


class TestReferenceBuiltStreamLoads:
    def test_canonical_reencode_with_options_loads(self, generated, tmp_path):
        """protobuf re-serializes every record (canonical field order +
        encodings, unlike our hand encoder) and fills NON-EMPTY
        trajectory builder options; load_pbstream_state must accept it
        and reproduce the graph."""
        from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph2D

        Header = generated("SerializationHeader")
        Data = generated("SerializedData")

        pg = _build_graph_2d()
        path = str(tmp_path / "ours.pbstream")
        write_pbstream_state(pg, path)

        records = list(read_records(path))
        out = [Header.FromString(records[0]).SerializeToString()]
        for rec in records[1:]:
            msg = Data.FromString(rec)
            if msg.WhichOneof("data") == "all_trajectory_builder_options":
                # The shape a real reference-written stream has
                # (ref: trajectory_builder_options.proto
                # AllTrajectoryBuilderOptions.options_with_sensor_ids).
                del msg.all_trajectory_builder_options.options_with_sensor_ids[:]
                entry = msg.all_trajectory_builder_options.options_with_sensor_ids.add()
                opts = entry.trajectory_builder_options
                opts.trajectory_builder_2d_options.min_range = 0.3
                opts.trajectory_builder_2d_options.max_range = 30.0
                opts.pure_localization = False
                sid = entry.sensor_id.add()
                sid.type = sid.RANGE
                sid.id = "scan"
            out.append(msg.SerializeToString())
        path2 = str(tmp_path / "reference_built.pbstream")
        write_records(path2, out)

        options = replace_deep(
            MapBuilderOptions(), {"pose_graph.async_work_queue": False}
        ).pose_graph
        pg2 = PoseGraph2D(options)
        remap = load_pbstream_state(pg2, path2, load_frozen_state=True)
        assert pg2.is_frozen(remap[0])
        assert len(pg2.nodes) == 3 and len(pg2.submaps) == 1
        assert len(pg2.constraints) == 3
        for a, b in zip(pg.nodes, pg2.nodes):
            np.testing.assert_allclose(a.global_pose.t, b.global_pose.t, atol=1e-9)
