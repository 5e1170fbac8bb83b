"""Classic discrete-time 3D local SLAM front-end.

(ref: cartographer/mapping/internal/3d/local_trajectory_builder_3d.{h,cc}
— predict with the extrapolator, per-scan unwarp, adaptive voxel filters,
optional RealTimeCorrelativeScanMatcher3D, CeresScanMatcher3D over the
high/low-resolution pair, extrapolator feedback, motion-filtered insert
with rotational histogram. NOT wired into MapBuilder by the reference
either — map_builder.cc:126-140 always builds the optimizing builder for
3D; this classic builder exists for evaluation parity,
evaluation/trajectory_builder_evaluation.cc.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.motion_filter import MotionFilter
from hectorgrapher_tpu.mapping.pose_extrapolator import PoseExtrapolator
from hectorgrapher_tpu.mapping.scan_matching.correlative_3d import (
    make_search_window_3d,
    match_correlative_3d,
)
from hectorgrapher_tpu.mapping.scan_matching.gn_3d import match_gn_3d
from hectorgrapher_tpu.mapping.scan_matching.rotational_histogram import compute_histogram
from hectorgrapher_tpu.mapping.submap_3d import ActiveSubmaps3D, Submap3D
from hectorgrapher_tpu.sensor.types import PointCloud, RangeData, TimedPointCloudData, pad_cloud
from hectorgrapher_tpu.sensor.voxel_filter import adaptive_voxel_filter, compact_cloud, voxel_filter
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3
from hectorgrapher_tpu.transform.rigid import Rigid3


@dataclass
class InsertionResult3D:
    time: float
    local_pose: NpRigid3
    high_resolution_cloud: PointCloud
    low_resolution_cloud: PointCloud
    rotational_histogram: np.ndarray
    gravity_alignment: np.ndarray
    insertion_submaps: List[Submap3D]


@dataclass
class MatchingResult3D:
    time: float
    local_pose: NpRigid3
    range_data_in_local: RangeData
    insertion_result: Optional[InsertionResult3D]


class LocalTrajectoryBuilder3D:
    def __init__(self, options):
        """options: TrajectoryBuilder3DOptions."""
        self._options = options
        self._active_submaps = ActiveSubmaps3D(options.submaps, options.rotational_histogram_size)
        self._motion_filter = MotionFilter(options.motion_filter)
        self._extrapolator: Optional[PoseExtrapolator] = None
        from hectorgrapher_tpu.mapping.frontend_metrics import FrontEndMetrics

        self._frontend_metrics = FrontEndMetrics("classic_3d")
        self._cloud_cap = 4096
        self._P = 1024
        self._window = make_search_window_3d(
            options.real_time_correlative_scan_matcher.linear_search_window,
            options.real_time_correlative_scan_matcher.angular_search_window,
            options.submaps.high_resolution,
            options.max_range,
        )

    def add_imu_data(self, time: float, linear_acceleration, angular_velocity) -> None:
        if self._extrapolator is None:
            self._extrapolator = PoseExtrapolator.initialize_with_imu(
                pose_queue_duration=0.001,
                imu_gravity_time_constant=self._options.imu_gravity_time_constant,
                imu_time=time,
                linear_acceleration=np.asarray(linear_acceleration, float),
                angular_velocity=np.asarray(angular_velocity, float),
            )
        else:
            self._extrapolator.add_imu_data(time, linear_acceleration, angular_velocity)

    def add_odometry_data(self, time: float, pose: NpRigid3) -> None:
        if self._extrapolator is None:
            return
        self._extrapolator.add_odometry_data(time, pose)

    def add_range_data(self, data: TimedPointCloudData):
        """Instrumented front-end step: publishes per-scan latency and
        real-time ratios (ref: local_trajectory_builder_2d.cc:29-36,
        optimizing_local_trajectory_builder.cc:1667-1678)."""
        import time as _time

        t0w, t0c = _time.perf_counter(), _time.thread_time()
        result = self._add_range_data_impl(data)
        self._frontend_metrics.observe_step(
            float(data.time), _time.perf_counter() - t0w, _time.thread_time() - t0c
        )
        return result

    def _add_range_data_impl(self, data: TimedPointCloudData) -> Optional[MatchingResult3D]:
        """(ref: local_trajectory_builder_3d.cc AddRangeData — whole-scan
        unwarp via the extrapolated pose; num_accumulated_range_data=1)."""
        if self._extrapolator is None:
            return None  # IMU not initialized
        time = float(data.time)
        if self._extrapolator.last_pose_time() is None or time < self._extrapolator.last_pose_time():
            return None

        pts = np.asarray(data.ranges.positions)
        mask = np.asarray(data.ranges.mask)
        origin = np.asarray(data.origin)
        r = np.linalg.norm(pts - origin[None, :], axis=-1)
        # Out-of-range points are MASKED, never compacted: the organized
        # row structure (data.width) must survive for the structured-cloud
        # normal / triangle inserters, which pair i +- width neighbors
        # (same as the 2D path's mask-only cropping, local_2d.py).
        keep = mask & (r >= self._options.min_range) & (r <= self._options.max_range)
        if not keep.any():
            return None

        pose_prediction = self._extrapolator.extrapolate_pose(time)
        gravity_alignment = self._extrapolator.estimate_gravity_orientation(time)

        cloud_dev = voxel_filter(
            PointCloud(
                positions=jnp.asarray(pts.astype(np.float32)),
                mask=jnp.asarray(keep),
            ),
            self._options.voxel_filter_size,
        )
        high = compact_cloud(
            adaptive_voxel_filter(cloud_dev, self._options.high_resolution_adaptive_voxel_filter),
            self._P,
        )
        low = compact_cloud(
            adaptive_voxel_filter(cloud_dev, self._options.low_resolution_adaptive_voxel_filter),
            self._P,
        )

        pose_estimate = self._scan_match(pose_prediction, high, low)
        self._extrapolator.add_pose(time, pose_estimate)

        local_pts = nq.quat_rotate(pose_estimate.q, pts) + pose_estimate.t
        range_data_in_local = RangeData(
            origin=jnp.asarray(pose_estimate.apply(origin), jnp.float32),
            returns=PointCloud(
                positions=jnp.asarray(local_pts.astype(np.float32)),
                mask=jnp.asarray(keep),
            ),
            misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
            width=int(data.width),
        )

        insertion_result = None
        if not self._motion_filter.is_similar(time, pose_estimate):
            aligned = nq.quat_rotate(gravity_alignment, pts[keep])
            hist_cloud = pad_cloud(aligned.astype(np.float32), self._cloud_cap)
            hist = np.asarray(
                compute_histogram(
                    hist_cloud.positions, hist_cloud.mask, self._options.rotational_histogram_size
                )
            )
            submaps = self._active_submaps.insert_data(
                range_data_in_local, hist, np.asarray(pose_estimate.t)
            )
            insertion_result = InsertionResult3D(
                time=time,
                local_pose=pose_estimate,
                high_resolution_cloud=high,
                low_resolution_cloud=low,
                rotational_histogram=hist,
                gravity_alignment=gravity_alignment,
                insertion_submaps=submaps,
            )
        return MatchingResult3D(
            time=time,
            local_pose=pose_estimate,
            range_data_in_local=range_data_in_local,
            insertion_result=insertion_result,
        )

    def _scan_match(self, pose_prediction: NpRigid3, high: PointCloud, low: PointCloud) -> NpRigid3:
        """(ref: local_trajectory_builder_3d.cc ScanMatch — optional RTCS
        then CeresScanMatcher3D over the grid pair.)"""
        submap = self._active_submaps.matching_submap
        if submap is None:
            return pose_prediction

        initial = Rigid3(
            translation=jnp.asarray(pose_prediction.t, jnp.float32),
            rotation=jnp.asarray(pose_prediction.q, jnp.float32),
        )
        if self._options.use_online_correlative_scan_matching:
            _, initial = match_correlative_3d(
                submap.high_resolution_grid,
                high,
                initial,
                self._window,
                self._options.real_time_correlative_scan_matcher.translation_delta_cost_weight,
                self._options.real_time_correlative_scan_matcher.rotation_delta_cost_weight,
            )
        cm = self._options.ceres_scan_matcher
        refined, _ = match_gn_3d(
            submap.high_resolution_grid,
            submap.low_resolution_grid,
            high,
            low,
            initial,
            jnp.asarray(pose_prediction.t, jnp.float32),
            cm.occupied_space_weight_0,
            cm.occupied_space_weight_1,
            cm.translation_weight,
            cm.rotation_weight,
            num_iterations=cm.ceres_solver_options.max_num_iterations,
            only_optimize_yaw=bool(cm.only_optimize_yaw),
        )
        return NpRigid3(
            np.asarray(refined.translation, np.float64), np.asarray(refined.rotation, np.float64)
        )

    @property
    def active_submaps(self) -> ActiveSubmaps3D:
        return self._active_submaps
