"""Full pbstream state interop (VERDICT r2 #3): grid/cloud codecs match
the reference's value conversions, records round-trip through our codec,
and the wire bytes cross-validate against google.protobuf (an independent
encoder) for the packed-repeated payloads the reference uses.

(ref: io/internal/mapping_state_serialization.cc,
mapping/proto/serialization.proto, 2d/grid_2d.proto, 3d/hybrid_grid_tsdf.proto,
sensor/compressed_point_cloud.cc)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hectorgrapher_tpu.io import pbstream, protowire as pw
from hectorgrapher_tpu.io.pbstream_state import (
    decode_bounded,
    decode_compressed_cloud,
    decode_grid_2d,
    decode_hybrid_tsdf,
    decode_node_record,
    decode_submap_record,
    encode_bounded,
    encode_compressed_cloud,
    encode_grid_2d,
    encode_hybrid_tsdf,
    encode_node_record,
    encode_submap_record,
    load_pbstream_state,
    seconds_to_ticks,
    ticks_to_seconds,
    write_pbstream_state,
)
from hectorgrapher_tpu.mapping.grids import (
    GridMeta,
    ProbabilityGrid,
    TSDFGrid,
    make_probability_grid,
    make_tsdf_grid,
)
from hectorgrapher_tpu.mapping import probability_values as pv
from hectorgrapher_tpu.transform.np_quat import NpRigid3


class TestValueCodec:
    def test_codes_round_trip_exactly(self):
        codes = np.arange(0, 32768, dtype=np.int64)
        vals = decode_bounded(codes, -0.3, 0.3, 0.3)
        known = codes > 0
        back = encode_bounded(vals, -0.3, 0.3, known)
        np.testing.assert_array_equal(back[1:], codes[1:])
        assert back[0] == 0

    def test_half_step_error_bound(self):
        rng = np.random.default_rng(0)
        f = rng.uniform(0.1, 0.9, 1000)
        codes = encode_bounded(f, 0.1, 0.9, np.ones(1000, bool))
        back = decode_bounded(codes, 0.1, 0.9, 0.0)
        assert np.max(np.abs(back - f)) <= 0.5 * 0.8 / 32766 + 1e-7

    def test_time_ticks_round_trip(self):
        for t in [0.0, 0.1, 1234.5678901]:
            assert abs(ticks_to_seconds(seconds_to_ticks(t)) - t) < 1e-7


class TestCompressedCloud:
    def test_round_trip_within_raster(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        buf = encode_compressed_cloud(pts)
        out = decode_compressed_cloud(buf)
        assert out.shape == pts.shape
        # The codec re-orders points (block grouping); compare as sets on
        # the 1mm raster (rastered in float64 exactly as the codec does).
        a = np.sort(np.round(pts.astype(np.float64) / 0.001).astype(np.int64).view("i8,i8,i8"), axis=0)
        b = np.sort(np.round(out.astype(np.float64) / 0.001).astype(np.int64).view("i8,i8,i8"), axis=0)
        np.testing.assert_array_equal(a, b)


def random_probability_grid(seed=0, shape=(48, 40)):
    rng = np.random.default_rng(seed)
    log_odds = rng.normal(0, 2, shape).astype(np.float32)
    known = rng.uniform(size=shape) < 0.7
    meta = GridMeta(
        resolution=jnp.asarray(0.05, jnp.float32),
        min_corner=jnp.asarray([-1.2, -1.0], jnp.float32),
    )
    return ProbabilityGrid(
        log_odds=jnp.asarray(np.where(known, log_odds, 0.0)),
        known=jnp.asarray(known),
        meta=meta,
    )


def random_tsdf_grid_2d(seed=0, shape=(32, 40)):
    rng = np.random.default_rng(seed)
    weight = np.where(rng.uniform(size=shape) < 0.6, rng.uniform(0, 100, shape), 0.0)
    tsd = np.where(weight > 0, rng.uniform(-0.3, 0.3, shape), 0.3)
    meta = GridMeta(
        resolution=jnp.asarray(0.05, jnp.float32),
        min_corner=jnp.asarray([-0.8, -1.0], jnp.float32),
    )
    return TSDFGrid(
        tsd=jnp.asarray(tsd, jnp.float32),
        weight=jnp.asarray(weight, jnp.float32),
        truncation_distance=jnp.asarray(0.3, jnp.float32),
        max_weight=jnp.asarray(100.0, jnp.float32),
        meta=meta,
    )


class TestGrid2D:
    def test_probability_round_trip(self):
        grid = random_probability_grid()
        out = decode_grid_2d(encode_grid_2d(grid))
        assert isinstance(out, ProbabilityGrid)
        np.testing.assert_array_equal(np.asarray(out.known), np.asarray(grid.known))
        np.testing.assert_allclose(
            np.asarray(out.meta.min_corner), np.asarray(grid.meta.min_corner), atol=1e-5
        )
        p_in = np.asarray(grid.probability())
        p_out = np.asarray(out.probability())
        known = np.asarray(grid.known)
        assert np.max(np.abs(p_in[known] - p_out[known])) <= 0.8 / 32766 + 1e-6

    def test_tsdf_round_trip(self):
        grid = random_tsdf_grid_2d()
        out = decode_grid_2d(encode_grid_2d(grid))
        assert isinstance(out, TSDFGrid)
        known = np.asarray(grid.weight) > 0
        np.testing.assert_array_equal(np.asarray(out.weight) > 0, known)
        step = 0.6 / 32766
        assert np.max(np.abs(np.asarray(out.tsd)[known] - np.asarray(grid.tsd)[known])) <= step
        np.testing.assert_allclose(
            np.asarray(out.meta.min_corner), np.asarray(grid.meta.min_corner), atol=1e-5
        )

    def test_cell_layout_matches_reference_convention(self):
        """One known cell at our index (ox, oy) must land at reference flat
        index ix + iy*num_x with ix = num_x-1-oy, iy = num_y-1-ox
        (ref: 2d/map_limits.h GetCellIndex + grid_2d.h ToFlatIndex)."""
        grid = make_probability_grid(0.1, (6, 4))
        lo = np.zeros((6, 4), np.float32)
        known = np.zeros((6, 4), bool)
        ox, oy = 1, 3
        lo[ox, oy] = 2.0
        known[ox, oy] = True
        grid = grid._replace(log_odds=jnp.asarray(lo), known=jnp.asarray(known))
        fd = pw.fields_to_dict(encode_grid_2d(grid))
        codes = pw.repeated_varints(fd, 2)
        num_x, num_y = 4, 6  # ref cell_limits: num_x spans our y axis
        ix, iy = num_x - 1 - oy, num_y - 1 - ox
        flat = ix + iy * num_x
        nz = np.flatnonzero(codes)
        assert list(nz) == [flat]


class TestHybridTSDF:
    def _random_grid(self, center):
        """Grid on the reference lattice (voxel centers at index*res) when
        center = res/2 (ref: hybrid_grid.h GetCenterOfCell)."""
        grid = make_tsdf_grid(
            0.1, (16, 12, 8), truncation_distance=0.3, max_weight=50.0, center=center
        )
        rng = np.random.default_rng(3)
        weight = np.where(
            rng.uniform(size=(16, 12, 8)) < 0.3, rng.uniform(0, 50, (16, 12, 8)), 0.0
        ).astype(np.float32)
        tsd = np.where(weight > 0, rng.uniform(-0.3, 0.3, (16, 12, 8)), 0.3).astype(np.float32)
        return grid._replace(tsd=jnp.asarray(tsd), weight=jnp.asarray(weight))

    def test_round_trip_on_lattice(self):
        grid = self._random_grid(center=(0.05, 0.05, 0.05))
        out = decode_hybrid_tsdf(encode_hybrid_tsdf(grid))
        known_in = np.asarray(grid.weight) > 0
        tsd = np.asarray(grid.tsd)
        res = 0.1
        mc_in = np.asarray(grid.meta.min_corner)
        mc_out = np.asarray(out.meta.min_corner)
        step = 0.6 / 32766
        out_tsd = np.asarray(out.tsd)
        out_w = np.asarray(out.weight)
        for idx in zip(*np.nonzero(known_in)):
            world = mc_in + (np.asarray(idx) + 0.5) * res
            oi = np.round((world - mc_out) / res - 0.5).astype(int)
            assert abs(out_tsd[tuple(oi)] - tsd[idx]) <= step
            assert out_w[tuple(oi)] > 0
        assert np.sum(out_w > 0) == np.sum(known_in)

    def test_off_lattice_grid_snaps_rigidly(self):
        """An off-lattice grid (default centered at 0: half-voxel offset)
        round-trips values exactly with one rigid <= res/2 shift."""
        grid = self._random_grid(center=None)
        out = decode_hybrid_tsdf(encode_hybrid_tsdf(grid))
        known_in = np.asarray(grid.weight) > 0
        assert int(np.sum(np.asarray(out.weight) > 0)) == int(np.sum(known_in))
        # bounding-box corner of known voxels, ours vs decoded
        lo_idx = np.array([a.min() for a in np.nonzero(known_in)])
        mc_in_known = np.asarray(grid.meta.min_corner) + lo_idx * 0.1
        shift = np.asarray(out.meta.min_corner) - mc_in_known
        assert np.all(np.abs(shift) <= 0.05 + 1e-6)

    def test_active_submaps_grids_are_on_reference_lattice(self):
        """ActiveSubmaps3D places grid lattices on the reference raster so
        exports are lossless (submap_3d.py place())."""
        from hectorgrapher_tpu.common.config import SubmapsOptions3D
        from hectorgrapher_tpu.mapping.submap_3d import ActiveSubmaps3D

        active = ActiveSubmaps3D(SubmapsOptions3D(), histogram_size=16)
        active._add_submap(np.array([0.123, -0.456, 0.789]))
        sm = active.submaps[0]
        for grid in (sm.high_resolution_grid, sm.low_resolution_grid):
            res = float(np.asarray(grid.meta.resolution))
            mc_sub = np.asarray(grid.meta.min_corner, np.float64) - np.asarray(
                sm.local_pose.t, np.float64
            )
            frac = (mc_sub / res + 0.5) - np.round(mc_sub / res + 0.5)
            assert np.all(np.abs(frac) < 1e-4), frac


class TestNodeRecord:
    def test_round_trip_3d(self):
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode
        from hectorgrapher_tpu.sensor.types import pad_cloud

        rng = np.random.default_rng(4)
        high = pad_cloud(rng.uniform(-5, 5, (100, 3)).astype(np.float32), 128)
        low = pad_cloud(rng.uniform(-5, 5, (40, 3)).astype(np.float32), 64)
        node = PgNode(
            time=12.345,
            local_pose=NpRigid3(np.array([1.0, 2.0, 0.5])),
            global_pose=NpRigid3.identity(),
            high_cloud=high,
            low_cloud=low,
            histogram=rng.uniform(0, 1, 120).astype(np.float32),
            gravity_alignment=np.array([0.9, 0.1, 0.0, 0.0]) / np.linalg.norm([0.9, 0.1, 0, 0]),
        )
        rec = encode_node_record(0, 7, node)
        fd = pw.fields_to_dict(rec)
        out = decode_node_record(fd[4][0])
        assert out["trajectory_id"] == 0 and out["node_index"] == 7
        assert abs(out["time"] - 12.345) < 1e-6
        np.testing.assert_allclose(out["local_pose"].t, node.local_pose.t, atol=1e-12)
        np.testing.assert_allclose(out["gravity_alignment"], node.gravity_alignment, atol=1e-12)
        np.testing.assert_allclose(out["histogram"], node.histogram, atol=1e-7)
        assert out["high_cloud"].shape == (100, 3)
        assert out["low_cloud"].shape == (40, 3)


class TestFullState2D:
    def _build_graph(self):
        from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph2D, PgNode
        from hectorgrapher_tpu.mapping.submap_2d import Submap2D
        from hectorgrapher_tpu.sensor.types import pad_cloud

        options = replace_deep(
            MapBuilderOptions(),
            {
                "pose_graph.optimize_every_n_nodes": 0,
                "pose_graph.async_work_queue": False,
                "pose_graph.constraint_builder.sampling_ratio": 0.0,
            },
        ).pose_graph
        pg = PoseGraph2D(options)
        grid = random_probability_grid(seed=9, shape=(64, 64))
        submap = Submap2D(local_pose=NpRigid3(np.zeros(3)), grid=grid, insertion_finished=True)
        rng = np.random.default_rng(5)
        for k in range(3):
            cloud = pad_cloud(rng.uniform(-3, 3, (50, 3)).astype(np.float32), 64)
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

    def test_write_load_round_trip(self, tmp_path):
        from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph2D

        pg = self._build_graph()
        path = str(tmp_path / "state.pbstream")
        write_pbstream_state(pg, path)

        # The existing pbstream reader (the ground-truth tooling path)
        # parses the same file and sees all record kinds.
        info = pbstream.read_state(path)
        assert info.record_counts.get("submap") == 1
        assert info.record_counts.get("node") == 3
        assert len(info.constraints) == 3
        assert info.record_counts.get("all_trajectory_builder_options") == 1

        options = replace_deep(
            MapBuilderOptions(), {"pose_graph.async_work_queue": False}
        ).pose_graph
        pg2 = PoseGraph2D(options)
        remap = load_pbstream_state(pg2, path, load_frozen_state=True)
        assert pg2.is_frozen(remap[0])
        assert len(pg2.nodes) == 3 and len(pg2.submaps) == 1
        assert len(pg2.constraints) == 3
        for a, b in zip(pg.nodes, pg2.nodes):
            np.testing.assert_allclose(a.global_pose.t, b.global_pose.t, atol=1e-9)
            np.testing.assert_allclose(a.local_pose.t, b.local_pose.t, atol=1e-9)
        g_in = pg.submaps[0].submap.grid
        g_out = pg2.submaps[0].submap.grid
        known = np.asarray(g_in.known)
        np.testing.assert_array_equal(known, np.asarray(g_out.known))
        np.testing.assert_allclose(
            np.asarray(g_in.probability())[known],
            np.asarray(g_out.probability())[known],
            atol=0.8 / 32766 + 1e-6,
        )
        # Node clouds survive (1mm raster, set equality per node).
        for a, b in zip(pg.nodes, pg2.nodes):
            pa = np.asarray(a.cloud.positions)[np.asarray(a.cloud.mask)]
            pb = np.asarray(b.cloud.positions)[np.asarray(b.cloud.mask)]
            assert pa.shape == pb.shape
            sa = np.sort(np.round(pa.astype(np.float64) / 0.001).astype(np.int64).view("i8,i8,i8"), axis=0)
            sb = np.sort(np.round(pb.astype(np.float64) / 0.001).astype(np.int64).view("i8,i8,i8"), axis=0)
            np.testing.assert_array_equal(sa, sb)


    def test_state_convert_cli_round_trip(self, tmp_path):
        from hectorgrapher_tpu.io.serialization import save_state
        from hectorgrapher_tpu.tools.cli import main as cli_main

        pg = self._build_graph()
        npz1 = str(tmp_path / "a.npz")
        pbs = str(tmp_path / "b.pbstream")
        npz2 = str(tmp_path / "c.npz")
        save_state(pg, npz1)
        assert cli_main(["state-convert", npz1, pbs]) == 0
        assert cli_main(["state-convert", pbs, npz2]) == 0
        info = pbstream.read_state(pbs)
        assert info.record_counts.get("node") == 3
        assert cli_main(["state-info", pbs]) == 0


# ---------------------------------------------------------------------------
# Cross-validation against google.protobuf (independent encoder)
# ---------------------------------------------------------------------------


def _build_grid_protos():
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "test_grids.proto"
    fdp.package = "testgrid"
    fdp.syntax = "proto3"
    T = descriptor_pb2.FieldDescriptorProto

    def add_msg(name, fields):
        msg = fdp.message_type.add()
        msg.name = name
        for fname, number, ftype, type_name, repeated in fields:
            f = msg.field.add()
            f.name = fname
            f.number = number
            f.label = T.LABEL_REPEATED if repeated else T.LABEL_OPTIONAL
            f.type = ftype
            if type_name:
                f.type_name = f".testgrid.{type_name}"

    add_msg(
        "HybridGridTSDF",
        [
            ("resolution", 1, T.TYPE_FLOAT, None, False),
            ("x_indices", 3, T.TYPE_SINT32, None, True),
            ("y_indices", 4, T.TYPE_SINT32, None, True),
            ("z_indices", 5, T.TYPE_SINT32, None, True),
            ("values_tsd", 6, T.TYPE_INT32, None, True),
            ("values_weight", 7, T.TYPE_INT32, None, True),
            ("relative_truncation_distance", 8, T.TYPE_FLOAT, None, False),
            ("max_weight", 9, T.TYPE_FLOAT, None, False),
        ],
    )
    add_msg(
        "CompressedPointCloud",
        [
            ("num_points", 1, T.TYPE_INT32, None, False),
            ("point_data", 3, T.TYPE_INT32, None, True),
        ],
    )
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    get = lambda n: message_factory.GetMessageClass(pool.FindMessageTypeByName(f"testgrid.{n}"))
    return get("HybridGridTSDF"), get("CompressedPointCloud")


class TestGoogleProtobufCrossValidation:
    def test_hybrid_tsdf_bytes_parse_with_protobuf(self):
        HybridGridTSDF, _ = _build_grid_protos()
        grid = make_tsdf_grid(0.1, (8, 8, 4), truncation_distance=0.3, max_weight=50.0)
        rng = np.random.default_rng(6)
        weight = np.where(
            rng.uniform(size=(8, 8, 4)) < 0.5, rng.uniform(1, 50, (8, 8, 4)), 0.0
        ).astype(np.float32)
        tsd = np.where(weight > 0, rng.uniform(-0.3, 0.3, (8, 8, 4)), 0.3).astype(np.float32)
        grid = grid._replace(tsd=jnp.asarray(tsd), weight=jnp.asarray(weight))
        buf = encode_hybrid_tsdf(grid)
        msg = HybridGridTSDF()
        msg.ParseFromString(buf)
        assert msg.resolution == pytest.approx(0.1)
        assert msg.relative_truncation_distance == pytest.approx(0.3)
        n_known = int(np.sum(weight > 0))
        assert len(msg.x_indices) == n_known
        assert len(msg.values_tsd) == n_known
        assert all(1 <= v <= 32767 for v in msg.values_tsd)
        # And protobuf-serialized bytes decode with OUR decoder.
        out = decode_hybrid_tsdf(msg.SerializeToString())
        assert int(np.sum(np.asarray(out.weight) > 0)) == n_known

    def test_compressed_cloud_bytes_parse_with_protobuf(self):
        _, CompressedPointCloud = _build_grid_protos()
        rng = np.random.default_rng(7)
        pts = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        buf = encode_compressed_cloud(pts)
        msg = CompressedPointCloud()
        msg.ParseFromString(buf)
        assert msg.num_points == 64
        out = decode_compressed_cloud(msg.SerializeToString())
        assert out.shape == (64, 3)
