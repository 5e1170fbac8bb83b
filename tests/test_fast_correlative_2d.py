"""2D loop-closure matcher tests
(ref: fast_correlative_scan_matcher_2d_test.cc — perturb pose and assert
the matcher recovers it from a wide window)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.common.config import ProbabilityGridRangeDataInserterOptions2D
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.grids import make_probability_grid
from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
    make_fast_search_config,
    match_fast_2d,
)
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import voxel_filter
from hectorgrapher_tpu.transform.rigid import Rigid2


def make_map_and_cloud(offset_xy, offset_yaw, seed=0):
    grid = make_probability_grid(0.05, (640, 640))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=32.0, resolution=0.05
    )
    pts0 = raycast_rect_room_2d(np.zeros(2), 0.0, num_rays=1440)
    pts0 = pts0[~np.isnan(pts0[:, 0])]
    rd = RangeData(
        origin=jnp.zeros(3, jnp.float32),
        returns=pad_cloud(pts0.astype(np.float32), 2048),
        misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
    )
    for _ in range(3):
        grid = insert(grid, rd)
    # A scan taken from the offset pose.
    pts1 = raycast_rect_room_2d(np.asarray(offset_xy), offset_yaw, num_rays=720)
    pts1 = pts1[~np.isnan(pts1[:, 0])]
    cloud = voxel_filter(pad_cloud(pts1.astype(np.float32), 1024), 0.1)
    return grid, cloud


class TestFastCorrelative2D:
    def test_recovers_large_offset(self):
        true_xy = (1.3, -0.8)
        true_yaw = 0.25
        grid, cloud = make_map_and_cloud(true_xy, true_yaw)
        config = make_fast_search_config(
            linear_search_window=3.0,
            angular_search_window=np.radians(25.0),
            resolution=0.05,
            max_scan_range=12.0,
            branch_and_bound_depth=6,
            top_k=256,
        )
        score, pose = match_fast_2d(grid, cloud, Rigid2.identity(), config)
        assert float(score) > 0.4, f"score {float(score)}"
        np.testing.assert_allclose(np.asarray(pose.translation), true_xy, atol=0.1)
        np.testing.assert_allclose(float(pose.angle), true_yaw, atol=0.02)

    def test_low_score_when_outside_window(self):
        # Offset far beyond the search window: matcher cannot reach truth.
        grid, cloud = make_map_and_cloud((5.0, 0.0), 0.0)
        config = make_fast_search_config(
            linear_search_window=1.0,
            angular_search_window=np.radians(10.0),
            resolution=0.05,
            max_scan_range=12.0,
            branch_and_bound_depth=5,
            top_k=128,
        )
        score_wrong, _ = match_fast_2d(grid, cloud, Rigid2.identity(), config)
        grid2, cloud2 = make_map_and_cloud((0.4, 0.2), 0.0)
        score_right, _ = match_fast_2d(grid2, cloud2, Rigid2.identity(), config)
        assert float(score_right) > float(score_wrong) + 0.1
