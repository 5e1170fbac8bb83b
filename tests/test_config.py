"""Config tree tests (ref: common/lua_parameter_dictionary_test.cc analog)."""

import math

import pytest

from hectorgrapher_tpu.common import config as cfg


def test_defaults_match_reference_lua():
    tb3 = cfg.TrajectoryBuilder3DOptions()
    assert tb3.min_range == 1.0
    assert tb3.max_range == 60.0
    assert tb3.submaps.high_resolution == 0.10
    assert tb3.submaps.low_resolution == 0.45
    assert tb3.submaps.num_range_data == 160
    assert tb3.optimizing_local_trajectory_builder.ct_window_horizon == 0.9
    assert tb3.optimizing_local_trajectory_builder.imu_integrator == "RK4"
    assert tb3.motion_filter.max_angle_radians == 0.004

    tb2 = cfg.TrajectoryBuilder2DOptions()
    assert tb2.submaps.num_range_data == 90
    assert tb2.submaps.range_data_inserter.probability_grid_range_data_inserter.hit_probability == 0.55
    assert tb2.real_time_correlative_scan_matcher.angular_search_window == pytest.approx(math.radians(20.0))

    pg = cfg.PoseGraphOptions()
    assert pg.optimize_every_n_nodes == 90
    assert pg.constraint_builder.min_score == 0.55
    assert pg.constraint_builder.fast_correlative_scan_matcher_3d.branch_and_bound_depth == 8
    assert pg.optimization_problem.huber_scale == 1e1


def test_merge_and_replace_deep():
    base = cfg.TrajectoryBuilder2DOptions()
    updated = cfg.replace_deep(base, {"submaps.num_range_data": 10, "max_range": 25.0})
    assert updated.submaps.num_range_data == 10
    assert updated.max_range == 25.0
    assert base.submaps.num_range_data == 90  # frozen: original untouched


def test_unknown_key_raises():
    base = cfg.TrajectoryBuilder2DOptions()
    with pytest.raises(KeyError):
        cfg.merge(base, {"not_a_key": 1})
