"""Tests for the Lua configuration loader.

Mirrors the reference's lua_parameter_dictionary_test.cc /
configuration_file_resolver usage: the production config path (Lua text ->
typed options) is exercised directly, including on the reference's own
configuration_files/ when present.
"""

import math
import os

import pytest

from hectorgrapher_tpu.common import config as cfg
from hectorgrapher_tpu.common import lua_config

REF_CONFIG_DIR = "/root/reference/configuration_files"


class TestLuaEvaluator:
    def test_literals_and_arithmetic(self):
        g, ret = lua_config.run_lua(
            """
            a = 1 + 2 * 3
            b = (1 + 2) * 3
            c = 2^10
            d = 7 % 3
            e = -4.5e-1
            f = 0x10
            g_ = 10 / 4
            h = true
            i = false
            j = nil
            s = "hello" .. " " .. "world"
            n = 10 .. ""
            """
        )
        assert g["a"] == 7
        assert g["b"] == 9
        assert g["c"] == 1024
        assert g["d"] == 1
        assert g["e"] == -0.45
        assert g["f"] == 16
        assert g["g_"] == 2.5
        assert g["h"] is True and g["i"] is False and g["j"] is None
        assert g["s"] == "hello world"
        assert g["n"] == "10"

    def test_math_library(self):
        g, _ = lua_config.run_lua(
            """
            a = math.rad(30.)
            b = math.deg(math.pi)
            c = math.sqrt(16.)
            d = math.floor(2.7)
            e = math.max(1, 5, 3)
            f = math.huge
            """
        )
        assert g["a"] == pytest.approx(math.radians(30.0))
        assert g["b"] == pytest.approx(180.0)
        assert g["c"] == 4.0
        assert g["d"] == 2
        assert g["e"] == 5
        assert g["f"] == math.inf

    def test_logic_and_comparison(self):
        g, _ = lua_config.run_lua(
            """
            a = 1 < 2
            b = 2 ~= 2
            c = false or 5
            d = nil and 7
            e = not nil
            f = 3 == 3.0
            """
        )
        assert g["a"] is True
        assert g["b"] is False
        assert g["c"] == 5
        assert g["d"] is None
        assert g["e"] is True
        assert g["f"] is True

    def test_tables_nested_and_array_part(self):
        g, _ = lua_config.run_lua(
            """
            t = {
              x = 1,
              nested = { y = 2, z = { "a", "b" } },
              [3] = "three";
            }
            t.nested.y = 20
            t["x"] = 10
            """
        )
        t = g["t"]
        assert t["x"] == 10
        assert t["nested"]["y"] == 20
        assert t["nested"]["z"] == {1: "a", 2: "b"}
        assert t[3] == "three"

    def test_table_reference_semantics(self):
        # Exactly the reference's pattern: MAP_BUILDER.pose_graph aliases
        # POSE_GRAPH, so later overrides flow through (map_builder.lua:21).
        g, _ = lua_config.run_lua(
            """
            POSE_GRAPH = { optimize_every_n_nodes = 90 }
            MAP_BUILDER = { pose_graph = POSE_GRAPH }
            POSE_GRAPH.optimize_every_n_nodes = 3
            """
        )
        assert g["MAP_BUILDER"]["pose_graph"]["optimize_every_n_nodes"] == 3
        assert g["MAP_BUILDER"]["pose_graph"] is g["POSE_GRAPH"]

    def test_local_and_global_variable_reference(self):
        g, _ = lua_config.run_lua(
            """
            local MAX = 60.
            RANGE = MAX
            T = { max_range = MAX }
            """
        )
        assert "MAX" not in g
        assert g["RANGE"] == 60.0
        assert g["T"]["max_range"] == 60.0

    def test_return_options(self):
        _, ret = lua_config.run_lua(
            """
            options = { a = 1, b = { c = 2 } }
            options.b.c = 3
            return options
            """
        )
        assert ret == {"a": 1, "b": {"c": 3}}

    def test_include(self, tmp_path):
        (tmp_path / "base.lua").write_text("BASE = { v = 1 }\n")
        (tmp_path / "top.lua").write_text('include "base.lua"\nBASE.v = 2\n')
        g, _ = lua_config.load_lua_file("top.lua", [str(tmp_path)])
        assert g["BASE"]["v"] == 2

    def test_include_first_match_wins(self, tmp_path):
        d1 = tmp_path / "d1"
        d2 = tmp_path / "d2"
        d1.mkdir()
        d2.mkdir()
        (d1 / "x.lua").write_text("WHO = 'd1'\n")
        (d2 / "x.lua").write_text("WHO = 'd2'\n")
        g, _ = lua_config.load_lua_file("x.lua", [str(d1), str(d2)])
        assert g["WHO"] == "d1"

    def test_comments(self):
        g, _ = lua_config.run_lua(
            """
            -- a line comment
            a = 1  -- trailing
            --[[ a block
                 comment a = 99 ]]
            b = 2
            """
        )
        assert g["a"] == 1 and g["b"] == 2

    def test_undefined_variable_raises(self):
        with pytest.raises(lua_config.LuaError):
            lua_config.run_lua("a = UNDEFINED_THING\n")

    def test_os_getenv(self, monkeypatch):
        monkeypatch.setenv("HG_TEST_ENV", "hello")
        g, _ = lua_config.run_lua('a = os.getenv("HG_TEST_ENV")\nb = os.getenv("HG_MISSING_X")\n')
        assert g["a"] == "hello"
        assert g["b"] is None


class TestOptionsFromLua:
    def test_simple_overrides(self):
        code = """
        POSE_GRAPH = { optimize_every_n_nodes = 42 }
        MAP_BUILDER = {
          use_trajectory_builder_2d = true,
          pose_graph = POSE_GRAPH,
        }
        POSE_GRAPH.constraint_builder = { min_score = 0.66 }
        """
        g, ret = lua_config.run_lua(code)
        loaded = lua_config.map_builder_options_from_lua(g, ret)
        mb = loaded.map_builder
        assert mb.use_trajectory_builder_2d is True
        assert mb.pose_graph.optimize_every_n_nodes == 42
        assert mb.pose_graph.constraint_builder.min_score == 0.66
        # untouched defaults survive
        assert mb.pose_graph.constraint_builder.sampling_ratio == 0.3

    def test_trajectory_builder_wrapper_keys(self):
        code = """
        TRAJECTORY_BUILDER_2D = { max_range = 25. }
        TRAJECTORY_BUILDER = {
          trajectory_builder_2d = TRAJECTORY_BUILDER_2D,
          collate_fixed_frame = false,
          collate_landmarks = true,
          pure_localization_trimmer = { max_submaps_to_keep = 4 },
        }
        MAP_BUILDER = { use_trajectory_builder_2d = true }
        """
        g, ret = lua_config.run_lua(code)
        loaded = lua_config.map_builder_options_from_lua(g, ret)
        assert loaded.map_builder.trajectory_builder_2d.max_range == 25.0
        assert loaded.collate_fixed_frame is False
        assert loaded.collate_landmarks is True
        assert loaded.pure_localization_max_submaps_to_keep == 4

    def test_unknown_key_raises_strict(self):
        code = "MAP_BUILDER = { not_a_real_option = 1 }"
        g, ret = lua_config.run_lua(code)
        with pytest.raises(KeyError):
            lua_config.map_builder_options_from_lua(g, ret, strict=True)
        loaded = lua_config.map_builder_options_from_lua(g, ret, strict=False)
        assert isinstance(loaded.map_builder, cfg.MapBuilderOptions)

    def test_overlapping_submaps_trimmer(self):
        code = """
        POSE_GRAPH = {
          overlapping_submaps_trimmer_2d = {
            fresh_submaps_count = 2,
            min_covered_area = 3.,
            min_added_submaps_count = 6,
          },
        }
        MAP_BUILDER = { pose_graph = POSE_GRAPH }
        """
        g, ret = lua_config.run_lua(code)
        loaded = lua_config.map_builder_options_from_lua(g, ret)
        trimmer = loaded.map_builder.pose_graph.overlapping_submaps_trimmer_2d
        assert trimmer is not None
        assert trimmer.fresh_submaps_count == 2
        assert trimmer.min_covered_area == 3.0
        assert trimmer.min_added_submaps_count == 6


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR), reason="reference configs unavailable")
class TestReferenceConfigurationFiles:
    """Load the reference's own Lua files and check they reproduce our
    defaults (which were written to mirror them)."""

    def _load(self):
        code = (
            'include "map_builder.lua"\n'
            'include "trajectory_builder.lua"\n'
            "options = { map_builder = MAP_BUILDER, trajectory_builder = TRAJECTORY_BUILDER }\n"
            "return options\n"
        )
        g, ret = lua_config.run_lua(code, config_dirs=[REF_CONFIG_DIR])
        return lua_config.map_builder_options_from_lua(g, ret)

    def test_defaults_match(self):
        loaded = self._load()
        mb = loaded.map_builder
        default = cfg.MapBuilderOptions()
        # pose graph block
        assert mb.pose_graph.optimize_every_n_nodes == 90
        assert mb.pose_graph.constraint_builder.min_score == 0.55
        assert mb.pose_graph.constraint_builder.fast_correlative_scan_matcher.angular_search_window == pytest.approx(
            math.radians(30.0)
        )
        assert mb.pose_graph.optimization_problem.ceres_solver_options.max_num_iterations == 50
        assert mb.pose_graph.max_num_final_iterations == 200
        # 2D block
        assert mb.trajectory_builder_2d.max_range == default.trajectory_builder_2d.max_range
        assert mb.trajectory_builder_2d.real_time_correlative_scan_matcher.angular_search_window == pytest.approx(
            math.radians(20.0)
        )
        # 3D block incl. the CT optimizer
        tb3 = mb.trajectory_builder_3d
        assert tb3.max_range == 60.0  # via local MAX_3D_RANGE variable
        assert tb3.low_resolution_adaptive_voxel_filter.max_range == 60.0
        assert tb3.optimizing_local_trajectory_builder.ct_window_horizon == 0.9
        assert tb3.optimizing_local_trajectory_builder.imu_integrator == "RK4"
        assert tb3.optimizing_local_trajectory_builder.odometry_translation_normalization == pytest.approx(2.0e-2)
        assert tb3.submaps.low_resolution_range_data_inserter.tsdf_range_data_inserter.insertion_ratio == pytest.approx(0.1)
        # wrapper flags from trajectory_builder.lua
        assert loaded.collate_fixed_frame is True
        assert loaded.collate_landmarks is False

    def test_user_style_override_flows_through_alias(self):
        code = (
            'include "map_builder.lua"\n'
            'include "trajectory_builder.lua"\n'
            "MAP_BUILDER.use_trajectory_builder_3d = true\n"
            "TRAJECTORY_BUILDER_3D.submaps.num_range_data = 55\n"
            "POSE_GRAPH.optimize_every_n_nodes = 7\n"
            "options = { map_builder = MAP_BUILDER, trajectory_builder = TRAJECTORY_BUILDER }\n"
            "return options\n"
        )
        g, ret = lua_config.run_lua(code, config_dirs=[REF_CONFIG_DIR])
        loaded = lua_config.map_builder_options_from_lua(g, ret)
        mb = loaded.map_builder
        assert mb.use_trajectory_builder_3d is True
        assert mb.trajectory_builder_3d.submaps.num_range_data == 55
        assert mb.pose_graph.optimize_every_n_nodes == 7

    def test_map_builder_server_lua(self):
        g, _ = lua_config.load_lua_file("map_builder_server.lua", [REF_CONFIG_DIR])
        assert "MAP_BUILDER_SERVER" in g
        assert g["MAP_BUILDER_SERVER"]["map_builder"] is g["MAP_BUILDER"]
