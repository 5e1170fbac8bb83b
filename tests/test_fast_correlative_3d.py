"""3D loop-closure matcher tests
(ref: fast_correlative_scan_matcher_3d_test.cc)."""

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.common.config import (
    FastCorrelativeScanMatcherOptions3D,
    TSDFRangeDataInserterOptions3D,
)
from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
from hectorgrapher_tpu.mapping.grids import make_tsdf_grid
from hectorgrapher_tpu.mapping.inserters_3d import make_tsdf_inserter_3d
from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D,
)
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import compute_histogram
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import compact_cloud, voxel_filter
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.rigid import Rigid3


def build_grids():
    hi = make_tsdf_grid(0.1, (128, 128, 48), truncation_distance=0.3, max_weight=1000.0)
    lo = make_tsdf_grid(0.45, (48, 48, 16), truncation_distance=1.0, max_weight=1000.0)
    opts = TSDFRangeDataInserterOptions3D(normal_computation_method="NONE", min_range=0.4, max_range=30.0)
    ins_hi = make_tsdf_inserter_3d(opts, 0.1)
    ins_lo = make_tsdf_inserter_3d(opts, 0.45)
    hist = np.zeros(120, np.float32)
    for pose_t in [np.zeros(3), np.array([0.4, 0.3, 0.0])]:
        pts = raycast_box_room_3d(pose_t, nq.quat_identity(), num_azimuth=128, num_elevation=24)
        pts = pts[~np.isnan(pts[:, 0])] + pose_t
        rd = RangeData(
            origin=jnp.asarray(pose_t, jnp.float32),
            returns=pad_cloud(pts.astype(np.float32), 4096),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 4),
        )
        hi = ins_hi(hi, rd)
        lo = ins_lo(lo, rd)
        hc = pad_cloud(pts.astype(np.float32), 4096)
        hist += np.asarray(compute_histogram(hc.positions, hc.mask, 120))
    return hi, lo, hist


class TestFastCorrelative3D:
    def test_recovers_offset_pose(self):
        hi, lo, submap_hist = build_grids()
        true_t = np.array([0.8, -0.6, 0.1])
        true_yaw = 0.15
        q = nq.quat_from_axis_angle(np.array([0.0, 0.0, true_yaw]))
        pts = raycast_box_room_3d(true_t, q, num_azimuth=96, num_elevation=20)
        pts = pts[~np.isnan(pts[:, 0])]

        scan_cloud = compact_cloud(voxel_filter(pad_cloud(pts.astype(np.float32), 2048), 0.15), 1024)
        low_cloud = compact_cloud(voxel_filter(pad_cloud(pts.astype(np.float32), 2048), 0.45), 512)
        scan_hist = compute_histogram(scan_cloud.positions, scan_cloud.mask, 120)

        options = FastCorrelativeScanMatcherOptions3D(
            branch_and_bound_depth=5,
            linear_xy_search_window=2.0,
            linear_z_search_window=0.5,
            angular_search_window=np.radians(20.0),
            min_rotational_score=0.3,
        )
        matcher = FastCorrelativeScanMatcher3D(options, hi, lo, submap_hist)
        score, low_score, rot_score, pose = matcher.match(
            Rigid3.identity(), scan_cloud, low_cloud, scan_hist, 0.0, max_scan_range=10.0, top_k=2048
        )
        assert float(score) > 0.4, f"score {float(score)}"  # sparse synthetic map caps absolute score
        np.testing.assert_allclose(np.asarray(pose.translation), true_t, atol=0.15)
        from hectorgrapher_tpu.transform.rigid import quat_yaw

        np.testing.assert_allclose(float(quat_yaw(pose.rotation)), true_yaw, atol=0.05)
        assert float(low_score) > 0.4
