"""Submap painting + trajectory drawing (ref: io/submap_painter.cc,
io/draw_trajectories.cc, io/color.cc) and the repo-owned Lua defaults."""

import math
import os

import numpy as np
import pytest

from hectorgrapher_tpu.io import drawing
from hectorgrapher_tpu.mapping.grids import make_probability_grid, make_tsdf_grid
from hectorgrapher_tpu.transform.np_quat import NpRigid3
from hectorgrapher_tpu.transform import np_quat as nq

import jax.numpy as jnp


def _occupied_band_grid(resolution=0.05, size=64):
    """Probability grid with a known occupied band at local x in [0.5, 1.0]."""
    grid = make_probability_grid(resolution, (size, size))
    prob = np.full((size, size), 0.5, np.float32)
    known = np.zeros((size, size), bool)
    # cell x index for local x: min_corner = -size*res/2
    half = size // 2
    x0 = half + int(0.5 / resolution)
    x1 = half + int(1.0 / resolution)
    known[x0:x1, :] = True
    prob[x0:x1, :] = 0.95
    from hectorgrapher_tpu.mapping import probability_values as pv

    return grid._replace(
        log_odds=jnp.asarray(np.log(prob / (1 - prob)), jnp.float32),
        known=jnp.asarray(known),
    )


class FakeSubmap:
    def __init__(self, grid):
        self.grid = grid


class TestColors:
    def test_golden_ratio_colors_distinct_and_deterministic(self):
        c0, c1, c2 = drawing.get_color(0), drawing.get_color(1), drawing.get_color(2)
        assert c0 == drawing.get_color(0)
        assert c0 != c1 != c2
        for c in (c0, c1, c2):
            assert all(0.0 <= v <= 1.0 for v in c)


class TestPainting:
    def test_single_submap_occupied_band_lands_at_global_position(self):
        grid = _occupied_band_grid()
        pose = NpRigid3(np.array([2.0, 0.0, 0.0]))
        sl = drawing.submap_to_slice(FakeSubmap(grid), pose)
        painted = drawing.paint_submap_slices([sl], resolution=0.05)
        # world x in [2.5, 3.0] must be dark (occupied), alpha ~1.
        col_lo, row = painted.pose_to_pixel(NpRigid3(np.array([2.55, 0.0, 0.0])))
        assert painted.alpha[row, col_lo] > 0.5
        assert painted.intensity[row, col_lo] < 0.3
        # world x = 2.0 (submap center, unknown cells) stays transparent.
        col_c, row_c = painted.pose_to_pixel(pose)
        assert painted.alpha[row_c, col_c] < 0.2

    def test_rotated_submap_band_rotates_with_pose(self):
        grid = _occupied_band_grid()
        yaw = math.pi / 2.0
        pose = NpRigid3(np.zeros(3), nq.quat_from_axis_angle(np.array([0.0, 0.0, yaw])))
        sl = drawing.submap_to_slice(FakeSubmap(grid), pose)
        painted = drawing.paint_submap_slices([sl], resolution=0.05)
        # local +x maps to global +y: band now at world y in [0.5, 1.0].
        col, row = painted.pose_to_pixel(NpRigid3(np.array([0.0, 0.75, 0.0])))
        assert painted.alpha[row, col] > 0.5
        assert painted.intensity[row, col] < 0.3
        col2, row2 = painted.pose_to_pixel(NpRigid3(np.array([0.75, 0.0, 0.0])))
        assert painted.alpha[row2, col2] < 0.2

    def test_overlapping_submaps_compose_with_over_operator(self):
        grid = _occupied_band_grid()
        a = drawing.submap_to_slice(FakeSubmap(grid), NpRigid3(np.zeros(3)))
        b = drawing.submap_to_slice(FakeSubmap(grid), NpRigid3(np.array([0.25, 0.0, 0.0])))
        painted = drawing.paint_submap_slices([a, b], resolution=0.05)
        # union band: [0.5, 1.25] occupied
        for x in (0.6, 0.9, 1.2):
            col, row = painted.pose_to_pixel(NpRigid3(np.array([x, 0.0, 0.0])))
            assert painted.alpha[row, col] > 0.5, x

    def test_tsdf_slice_renders_surface_dark(self):
        grid = make_tsdf_grid(0.05, (32, 32), truncation_distance=0.3, max_weight=100.0)
        tsd = np.asarray(grid.tsd).copy()
        weight = np.asarray(grid.weight).copy()
        tsd[10:12, :] = 0.0
        weight[10:12, :] = 5.0
        grid = grid._replace(tsd=jnp.asarray(tsd), weight=jnp.asarray(weight))
        intensity, alpha = drawing._grid_images(grid)
        assert alpha[11, 4] == 1.0 and intensity[11, 4] < 0.1
        assert alpha[20, 4] == 0.0

    def test_3d_grid_projects_over_z(self):
        grid = make_tsdf_grid(0.1, (16, 16, 8), truncation_distance=0.3, max_weight=100.0)
        tsd = np.asarray(grid.tsd).copy()
        weight = np.asarray(grid.weight).copy()
        tsd[5, 5, 3] = 0.0
        weight[5, 5, 3] = 1.0
        grid = grid._replace(tsd=jnp.asarray(tsd), weight=jnp.asarray(weight))
        intensity, alpha = drawing._grid_images(grid)
        assert intensity.shape == (16, 16)
        assert alpha[5, 5] == 1.0 and intensity[5, 5] < 0.1
        assert alpha[0, 0] == 0.0

    def test_empty_paint(self):
        painted = drawing.paint_submap_slices([], resolution=0.05)
        assert painted.alpha.max() == 0.0


class TestTrajectoryDrawing:
    def test_polyline_markers_and_color(self):
        rgb = np.zeros((64, 64, 3), np.uint8)
        pts = [(10, 10), (50, 10), (50, 50)]
        drawing.draw_trajectory(rgb, pts, (0.0, 0.0, 1.0))
        # line midpoint blue-ish
        assert rgb[10, 30, 2] > 100 and rgb[10, 30, 0] < 80
        # start marker green, end marker red (ref: draw_trajectories.cc:48-63)
        assert rgb[10, 10, 1] > 100
        assert rgb[50, 50, 0] > 100
        # untouched background stays black
        assert rgb[60, 5].sum() == 0

    def test_empty_and_single_point(self):
        rgb = np.zeros((16, 16, 3), np.uint8)
        drawing.draw_trajectory(rgb, [], (1.0, 0.0, 0.0))
        assert rgb.sum() == 0
        drawing.draw_trajectory(rgb, [(8, 8)], (1.0, 0.0, 0.0))
        assert rgb[8, 8].sum() > 0


class TestPaintPoseGraphEndToEnd:
    def test_paint_state_through_cli(self, tmp_path):
        """Build a small pose graph, save state, render via the paint-map
        CLI (ref: the pbstream -> map image pipeline)."""
        from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
        from hectorgrapher_tpu.io.serialization import save_state
        from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph2D
        from hectorgrapher_tpu.mapping.submap_2d import Submap2D
        from hectorgrapher_tpu.sensor.types import PointCloud
        from hectorgrapher_tpu.tools import cli

        options = replace_deep(
            MapBuilderOptions(), {"pose_graph.optimize_every_n_nodes": 0}
        ).pose_graph
        pg = PoseGraph2D(options)
        cloud = PointCloud(jnp.zeros((4, 3), jnp.float32), jnp.ones(4, bool))
        submap = Submap2D(
            local_pose=NpRigid3(np.zeros(3)),
            grid=_occupied_band_grid(),
            num_range_data=2,
        )
        for i in range(3):
            pg.add_node(
                PgNode(
                    0.1 * i,
                    NpRigid3(np.array([0.1 * i, 0.0, 0.0])),
                    NpRigid3(np.array([0.1 * i, 0.0, 0.0])),
                    cloud=cloud,
                ),
                [submap],
            )
        pg.wait_for_all_computations()
        state = tmp_path / "state.npz"
        png = tmp_path / "map.png"
        save_state(pg, str(state))

        rc = cli.main(["paint-map", str(state), str(png), "--resolution", "0.05"])
        assert rc == 0
        data = png.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        import struct

        width, height = struct.unpack(">II", data[16:24])
        # 64-cell 0.05 m grid + 2*5 px padding = ~74 px each way
        assert width >= 70 and height >= 70


class TestRepoOwnedLuaDefaults:
    """The package ships its own configuration_files/ generated from the
    typed defaults (VERDICT #9: the package must be self-contained for
    .lua-carrying users)."""

    CFG_DIR = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hectorgrapher_tpu",
        "configuration_files",
    )

    def test_files_exist(self):
        for name in (
            "map_builder.lua",
            "pose_graph.lua",
            "trajectory_builder.lua",
            "trajectory_builder_2d.lua",
            "trajectory_builder_3d.lua",
            "map_builder_server.lua",
        ):
            assert os.path.isfile(os.path.join(self.CFG_DIR, name)), name

    def test_lua_defaults_round_trip_to_typed_defaults(self):
        from hectorgrapher_tpu.common import config as cfg
        from hectorgrapher_tpu.common import lua_config

        loaded = lua_config.load_map_builder_options("map_builder_server.lua", [self.CFG_DIR])
        assert loaded.map_builder == cfg.MapBuilderOptions()

    def test_user_override_on_repo_defaults(self):
        from hectorgrapher_tpu.common import lua_config

        code = (
            'include "map_builder.lua"\n'
            'include "trajectory_builder.lua"\n'
            "TRAJECTORY_BUILDER.trajectory_builder_2d.submaps.num_range_data = 33\n"
            "MAP_BUILDER.use_trajectory_builder_2d = true\n"
            "return { map_builder = MAP_BUILDER, trajectory_builder = TRAJECTORY_BUILDER }\n"
        )
        g, ret = lua_config.run_lua(code, config_dirs=[self.CFG_DIR])
        loaded = lua_config.map_builder_options_from_lua(g, ret)
        assert loaded.map_builder.use_trajectory_builder_2d is True
        assert loaded.map_builder.trajectory_builder_2d.submaps.num_range_data == 33


class TestMetricsHTTPExporter:
    def test_scrape_metrics_endpoint(self):
        """(ref: map_builder_server_main.cc:40-46 — prometheus exposer)"""
        import urllib.request

        from hectorgrapher_tpu.metrics.http_exporter import MetricsExporter
        from hectorgrapher_tpu.metrics.metrics import FamilyFactory

        factory = FamilyFactory()
        counter = factory.new_counter_family("mapping_2d_scans", "scans processed").add({})
        counter.increment()
        counter.increment()
        exporter = MetricsExporter(factory, port=0).start()
        try:
            url = f"http://127.0.0.1:{exporter.port}/metrics"
            with urllib.request.urlopen(url, timeout=10) as resp:
                body = resp.read().decode()
                assert resp.headers["Content-Type"].startswith("text/plain")
            assert "# HELP mapping_2d_scans scans processed" in body
            assert "mapping_2d_scans 2" in body
            with urllib.request.urlopen(
                f"http://127.0.0.1:{exporter.port}/healthz", timeout=10
            ) as resp:
                assert resp.read() == b"ok\n"
        finally:
            exporter.shutdown()
