"""Voxel filter tests (ref: sensor/internal/voxel_filter_test.cc)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.common.config import AdaptiveVoxelFilterOptions
from hectorgrapher_tpu.sensor import (
    PointCloud,
    adaptive_voxel_filter,
    compact_cloud,
    pad_cloud,
    voxel_filter,
    voxel_filter_count,
)


def test_keeps_one_point_per_voxel():
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.01, 0.0, 0.0], [1.02, 0.0, 0.0], [2.5, 2.5, 2.5]],
        dtype=np.float32,
    )
    cloud = pad_cloud(pts, 8)
    out = voxel_filter(cloud, 0.5)
    assert int(out.mask.sum()) == 3
    assert int(voxel_filter_count(cloud, 0.5)) == 3


def test_respects_mask():
    pts = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], dtype=np.float32)
    cloud = pad_cloud(pts, 4)
    cloud = cloud._replace(mask=cloud.mask & jnp.array([True, False, False, False]))
    out = voxel_filter(cloud, 0.5)
    assert int(out.mask.sum()) == 1


def test_fine_resolution_keeps_all():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    cloud = pad_cloud(pts, 128)
    out = voxel_filter(cloud, 0.001)
    assert int(out.mask.sum()) == 100


def test_adaptive_filter_reaches_min_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    cloud = pad_cloud(pts, 512)
    options = AdaptiveVoxelFilterOptions(max_length=8.0, min_num_points=100, max_range=50.0)
    out = adaptive_voxel_filter(cloud, options)
    assert int(out.mask.sum()) >= 100


def test_adaptive_filter_uses_max_length_when_enough():
    # Widely separated points: even the coarsest filter keeps them all.
    pts = (np.arange(30)[:, None] * np.array([[10.0, 0.0, 0.0]])).astype(np.float32)
    cloud = pad_cloud(pts, 32)
    options = AdaptiveVoxelFilterOptions(max_length=2.0, min_num_points=10, max_range=1e6)
    out = adaptive_voxel_filter(cloud, options)
    assert int(out.mask.sum()) == 30


def test_compact_cloud():
    pts = np.array([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]], dtype=np.float32)
    cloud = pad_cloud(pts, 6)
    cloud = cloud._replace(mask=jnp.array([True, False, True, False, False, False]))
    out = compact_cloud(cloud, 4)
    assert out.positions.shape == (4, 3)
    np.testing.assert_allclose(out.positions[:2, 0], [1.0, 3.0])
    assert list(np.asarray(out.mask)) == [True, True, False, False]
