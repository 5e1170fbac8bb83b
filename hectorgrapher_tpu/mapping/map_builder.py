"""MapBuilder: the top-level facade.

(ref: cartographer/mapping/map_builder.{h,cc} MapBuilder +
internal/global_trajectory_builder.cc GlobalTrajectoryBuilder — wires a
local trajectory builder to the pose graph, routes sensor data, exposes
trajectory lifecycle and serialization.)

Round-1 scope: single-process, synchronous (the reference's work-queue
concurrency is replaced by batched device launches); 2D pipeline wired to
LocalTrajectoryBuilder2D + PoseGraph2D; 3D wired to
OptimizingLocalTrajectoryBuilder + PoseGraph3D (the reference also always
uses the optimizing builder for 3D, map_builder.cc:126-140).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np

from hectorgrapher_tpu.mapping.ct.builder import OptimizingLocalTrajectoryBuilder
from hectorgrapher_tpu.mapping.local_2d import LocalTrajectoryBuilder2D
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
    PgNode,
    PoseGraph2D,
    PoseGraph3D,
    TrajectoryState,
)
from hectorgrapher_tpu.sensor.types import TimedPointCloudData
from hectorgrapher_tpu.transform.np_quat import NpRigid3


class TrajectoryBuilder:
    """Glue equivalent to GlobalTrajectoryBuilder: feeds local SLAM results
    into the pose graph (ref: global_trajectory_builder.cc:34-138)."""

    def __init__(self, trajectory_id: int, local_builder, pose_graph, use_3d: bool, callback=None):
        self.trajectory_id = trajectory_id
        self._local = local_builder
        self._pose_graph = pose_graph
        self._use_3d = use_3d
        self._callback = callback

    def add_range_data(self, data: TimedPointCloudData):
        result = self._local.add_range_data(data)
        if result is None:
            return result
        if result.insertion_result is None:
            # The reference invokes the local-SLAM callback for EVERY
            # matching result, including motion-filtered ones with no
            # insertion (global_trajectory_builder.cc) — pose streaming
            # must not stall while the robot is stationary.
            if self._callback is not None:
                self._callback(self.trajectory_id, result)
            return result
        ir = result.insertion_result
        if self._use_3d:
            node = PgNode(
                time=result.time,
                local_pose=result.local_pose,
                global_pose=NpRigid3.identity(),
                trajectory_id=self.trajectory_id,
                high_cloud=ir.high_resolution_cloud,
                low_cloud=ir.low_resolution_cloud,
                histogram=ir.rotational_histogram,
                gravity_alignment=ir.gravity_alignment,
            )
        else:
            node = PgNode(
                time=result.time,
                local_pose=result.local_pose,
                global_pose=NpRigid3.identity(),
                trajectory_id=self.trajectory_id,
                cloud=ir.filtered_gravity_aligned_point_cloud,
                gravity_alignment=ir.gravity_alignment,
            )
        newly_finished = []
        for submap in ir.insertion_submaps:
            # Reported-state lives ON the submap (an id()-keyed set would
            # grow unboundedly and misfire when CPython recycles the
            # address of a trimmed submap for a new one).
            if submap.insertion_finished and not getattr(submap, "_finish_reported", False):
                submap._finish_reported = True
                newly_finished.append(submap)
        self._pose_graph.add_node(node, ir.insertion_submaps, newly_finished)
        if self._callback is not None:
            self._callback(self.trajectory_id, result)
        return result

    def add_imu_data(self, time: float, linear_acceleration, angular_velocity) -> None:
        """Routes to local SLAM and the pose graph (ref:
        global_trajectory_builder.cc AddSensorData(ImuData))."""
        self._local.add_imu_data(time, linear_acceleration, angular_velocity)
        if hasattr(self._pose_graph, "add_imu_data"):
            self._pose_graph.add_imu_data(
                self.trajectory_id, time, linear_acceleration, angular_velocity
            )

    def add_odometry_data(self, time: float, pose: NpRigid3) -> None:
        """Routes to both local SLAM and the pose graph
        (ref: global_trajectory_builder.cc AddSensorData(OdometryData))."""
        self._local.add_odometry_data(time, pose)
        if hasattr(self._pose_graph, "add_odometry_data"):
            self._pose_graph.add_odometry_data(self.trajectory_id, time, pose)

    def add_fixed_frame_pose_data(self, time: float, pose: NpRigid3) -> None:
        if hasattr(self._pose_graph, "add_fixed_frame_pose_data"):
            self._pose_graph.add_fixed_frame_pose_data(self.trajectory_id, time, pose)

    def add_landmark_data(self, time, landmark_id, landmark_to_tracking, translation_weight, rotation_weight) -> None:
        if hasattr(self._pose_graph, "add_landmark_data"):
            self._pose_graph.add_landmark_data(
                self.trajectory_id, time, landmark_id, landmark_to_tracking,
                translation_weight, rotation_weight,
            )


class UplinkTrajectoryBuilder:
    """Trajectory builder WITHOUT local SLAM: injects uploaded
    LocalSlamResultPayloads straight into the pose graph.

    (ref: global_trajectory_builder.cc AddLocalSlamResultData:118-123 —
    "Can't add LocalSlamResultData with local_trajectory_builder_
    present"; local_slam_result_data.h:26-34; the submap re-instantiation
    is local_slam_result_2d.cc AddToPoseGraph:30-52 via SubmapController.)
    """

    def __init__(self, trajectory_id: int, pose_graph, use_3d: bool, callback=None):
        from hectorgrapher_tpu.cloud.local_slam_result import SubmapController

        self.trajectory_id = trajectory_id
        self._pose_graph = pose_graph
        self._use_3d = use_3d
        self._callback = callback
        self._controller = SubmapController()
        self.num_results_injected = 0

    def add_range_data(self, data):
        raise ValueError(
            "uplink trajectories accept LocalSlamResultPayloads, not raw range "
            "data (ref: global_trajectory_builder.cc:119 CHECK)"
        )

    def add_local_slam_result(self, payload) -> None:
        """(ref: local_slam_result_2d.cc AddToPoseGraph:30-52)"""
        submaps = []
        for sp in payload.submaps:
            submap = self._controller.update_submap(self.trajectory_id, sp)
            if submap is not None:
                submaps.append(submap)
        if not submaps:
            return  # ref: "Ignoring node"
        local_pose = NpRigid3(payload.local_pose_t, payload.local_pose_q)
        node = PgNode(
            time=payload.time,
            local_pose=local_pose,
            global_pose=NpRigid3.identity(),
            trajectory_id=self.trajectory_id,
            cloud=payload.cloud,
            high_cloud=payload.high_cloud,
            low_cloud=payload.low_cloud,
            histogram=payload.histogram,
            gravity_alignment=payload.gravity_alignment,
        )
        newly_finished = []
        for submap in submaps:
            if submap.insertion_finished and not getattr(submap, "_finish_reported", False):
                submap._finish_reported = True
                newly_finished.append(submap)
        self._pose_graph.add_node(node, submaps, newly_finished)
        self.num_results_injected += 1
        if self._callback is not None:
            self._callback(self.trajectory_id, payload)

    def add_imu_data(self, time: float, linear_acceleration, angular_velocity) -> None:
        if hasattr(self._pose_graph, "add_imu_data"):
            self._pose_graph.add_imu_data(
                self.trajectory_id, time, linear_acceleration, angular_velocity
            )

    def add_odometry_data(self, time: float, pose: NpRigid3) -> None:
        if hasattr(self._pose_graph, "add_odometry_data"):
            self._pose_graph.add_odometry_data(self.trajectory_id, time, pose)

    def add_fixed_frame_pose_data(self, time: float, pose: NpRigid3) -> None:
        if hasattr(self._pose_graph, "add_fixed_frame_pose_data"):
            self._pose_graph.add_fixed_frame_pose_data(self.trajectory_id, time, pose)

    def add_landmark_data(self, time, landmark_id, landmark_to_tracking, translation_weight, rotation_weight) -> None:
        if hasattr(self._pose_graph, "add_landmark_data"):
            self._pose_graph.add_landmark_data(
                self.trajectory_id, time, landmark_id, landmark_to_tracking,
                translation_weight, rotation_weight,
            )


class MapBuilder:
    """(ref: map_builder.cc MapBuilder)"""

    def __init__(self, options):
        """options: MapBuilderOptions."""
        self._options = options
        self._trajectory_builders: List[TrajectoryBuilder] = []
        if options.use_trajectory_builder_3d:
            self.pose_graph = PoseGraph3D(
                options.pose_graph,
                histogram_size=options.trajectory_builder_3d.rotational_histogram_size,
                max_scan_range=options.trajectory_builder_3d.submaps.high_resolution_max_range,
            )
        else:
            self.pose_graph = PoseGraph2D(
                options.pose_graph, max_scan_range=options.trajectory_builder_2d.max_range
            )

    def add_trajectory_builder(self, callback=None, local_slam_results: bool = False) -> int:
        """(ref: map_builder.cc AddTrajectoryBuilder:120-177; when the
        sensor set announces LOCAL_SLAM_RESULT data — the uplink
        federation case — no local trajectory builder is created and
        results are injected directly, map_builder.cc:126-133 +
        global_trajectory_builder.cc:118-123.)"""
        trajectory_id = len(self._trajectory_builders)
        use_3d = self._options.use_trajectory_builder_3d
        if local_slam_results:
            builder = UplinkTrajectoryBuilder(trajectory_id, self.pose_graph, use_3d, callback)
        else:
            if use_3d:
                local = OptimizingLocalTrajectoryBuilder(self._options.trajectory_builder_3d)
            else:
                local = LocalTrajectoryBuilder2D(self._options.trajectory_builder_2d)
            builder = TrajectoryBuilder(trajectory_id, local, self.pose_graph, use_3d, callback)
        self._trajectory_builders.append(builder)
        self.pose_graph.register_trajectory(trajectory_id)
        return trajectory_id

    def get_trajectory_builder(self, trajectory_id: int) -> TrajectoryBuilder:
        return self._trajectory_builders[trajectory_id]

    def finish_trajectory(self, trajectory_id: int) -> None:
        """(ref: map_builder.cc FinishTrajectory — the reference waits for
        the work queue before final state operations.)"""
        self.pose_graph.wait_for_all_computations()
        self.pose_graph.finish_trajectory(trajectory_id)

    def delete_trajectory(self, trajectory_id: int) -> None:
        """(ref: map_builder_interface.h DeleteTrajectory — removes the
        trajectory's data from the pose graph.)"""
        self.pose_graph.delete_trajectory(trajectory_id)
        # Builders are indexed by trajectory id; keep indices stable.
        if 0 <= trajectory_id < len(self._trajectory_builders):
            self._trajectory_builders[trajectory_id] = None

    def num_trajectory_builders(self) -> int:
        return len(self._trajectory_builders)
