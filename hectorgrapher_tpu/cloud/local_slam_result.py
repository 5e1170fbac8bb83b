"""Result-based uplink federation payloads + server-side submap control.

In the reference, a serving MapBuilderServer runs local SLAM and uploads
*results* — node data + insertion submaps — not raw sensor data; the
uplink injects them past local SLAM straight into its pose graph
(ref: cloud/internal/sensor/serialization.cc
CreateSensorDataForLocalSlamResult:80-100,
mapping/internal/global_trajectory_builder.cc AddLocalSlamResultData:118-123,
mapping/proto/serialization.proto LocalSlamResultData:64-68).

Wire policy mirrors the reference exactly: grid arrays ride along ONLY
when the submap is finished ("We only send the probability grid up if the
submap is finished", serialization.cc:93); unfinished submaps upload
metadata placeholders that the uplink's SubmapController instantiates
with empty grids and later fills from the finishing update
(ref: mapping/internal/submap_controller.h:29-60 UpdateSubmap).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid, TSDFGrid
from hectorgrapher_tpu.sensor.types import PointCloud


class SubmapPayload(NamedTuple):
    """One insertion submap as shipped to the uplink
    (ref: mapping/proto/serialization.proto Submap + submap_id)."""

    submap_index: int  # per-trajectory stable index (SubmapId.submap_index)
    kind: str  # "2d" | "3d"
    insertion_finished: bool
    num_range_data: int
    local_pose_t: np.ndarray
    local_pose_q: np.ndarray
    # Grid dicts: meta always present; arrays only when insertion_finished.
    grid: Optional[dict] = None  # 2d
    high_grid: Optional[dict] = None  # 3d
    low_grid: Optional[dict] = None  # 3d
    rotational_histogram: Optional[np.ndarray] = None  # 3d, finished only


class LocalSlamResultPayload(NamedTuple):
    """(ref: serialization.proto LocalSlamResultData — timestamp +
    TrajectoryNodeData + repeated Submap.)"""

    time: float
    local_pose_t: np.ndarray
    local_pose_q: np.ndarray
    dim: str  # "2d" | "3d"
    cloud: Optional[PointCloud] = None  # 2D gravity-aligned filtered cloud
    high_cloud: Optional[PointCloud] = None  # 3D
    low_cloud: Optional[PointCloud] = None
    histogram: Optional[np.ndarray] = None
    gravity_alignment: Optional[np.ndarray] = None
    submaps: Tuple[SubmapPayload, ...] = ()


# -- grid packing ------------------------------------------------------------


def _pack_grid(grid, include_arrays: bool) -> dict:
    d = {
        "resolution": float(grid.meta.resolution),
        "min_corner": np.asarray(grid.meta.min_corner, np.float32),
    }
    if isinstance(grid, TSDFGrid):
        quantized = grid.tsd.dtype == jnp.uint16
        d["type"] = "tsdf"
        d["shape"] = tuple(int(s) for s in grid.tsd.shape)
        d["truncation_distance"] = float(grid.truncation_distance)
        d["max_weight"] = float(grid.max_weight)
        if include_arrays:
            # uint16-quantized grids ship their codes verbatim (the
            # reference uploads uint16 proto cells, submap_3d.cc ToProto).
            d["quantized"] = quantized
            d["tsd"] = np.asarray(grid.tsd) if quantized else np.asarray(grid.tsd, np.float16)
            d["weight"] = (
                np.asarray(grid.weight) if quantized else np.asarray(grid.weight, np.float16)
            )
    else:
        quantized = grid.log_odds.dtype == jnp.uint16
        d["type"] = "probability"
        d["shape"] = tuple(int(s) for s in grid.log_odds.shape)
        if include_arrays:
            d["quantized"] = quantized
            d["log_odds"] = (
                np.asarray(grid.log_odds) if quantized else np.asarray(grid.log_odds, np.float16)
            )
            d["known"] = np.asarray(grid.known)
    return d


def _unpack_grid(d: dict):
    meta = GridMeta(
        resolution=jnp.asarray(d["resolution"], jnp.float32),
        min_corner=jnp.asarray(d["min_corner"], jnp.float32),
    )
    shape = tuple(d["shape"])
    dt = jnp.uint16 if d.get("quantized") else jnp.float32
    if d["type"] == "tsdf":
        trunc = d["truncation_distance"]
        return TSDFGrid(
            tsd=jnp.asarray(d.get("tsd", np.full(shape, trunc, np.float32)), dt),
            weight=jnp.asarray(d.get("weight", np.zeros(shape, np.float32)), dt),
            truncation_distance=jnp.asarray(trunc, jnp.float32),
            max_weight=jnp.asarray(d["max_weight"], jnp.float32),
            meta=meta,
        )
    return ProbabilityGrid(
        log_odds=jnp.asarray(d.get("log_odds", np.zeros(shape, np.float32)), dt),
        known=jnp.asarray(d.get("known", np.zeros(shape, bool))),
        meta=meta,
    )


def _fill_grid(grid, d: dict):
    """Replace a placeholder grid's contents from a finishing update."""
    dt = jnp.uint16 if d.get("quantized") else jnp.float32
    if d["type"] == "tsdf":
        return grid._replace(
            tsd=jnp.asarray(d["tsd"], dt),
            weight=jnp.asarray(d["weight"], dt),
        )
    return grid._replace(
        log_odds=jnp.asarray(d["log_odds"], dt),
        known=jnp.asarray(d["known"]),
    )


# -- payload construction (serving server side) -------------------------------


def make_local_slam_result_payload(
    result, use_3d: bool, starting_submap_index: int
) -> LocalSlamResultPayload:
    """Package an insertion result for upload
    (ref: serialization.cc CreateSensorDataForLocalSlamResult:80-100 —
    submap_index assigned as starting_submap_index + position; grid arrays
    included only for finished submaps)."""
    ir = result.insertion_result
    submaps = []
    for i, submap in enumerate(ir.insertion_submaps):
        finished = bool(submap.insertion_finished)
        common = dict(
            submap_index=starting_submap_index + i,
            insertion_finished=finished,
            num_range_data=int(submap.num_range_data),
            local_pose_t=np.asarray(submap.local_pose.t, np.float64),
            local_pose_q=np.asarray(submap.local_pose.q, np.float64),
        )
        if use_3d:
            submaps.append(
                SubmapPayload(
                    kind="3d",
                    high_grid=_pack_grid(submap.high_resolution_grid, finished),
                    low_grid=_pack_grid(submap.low_resolution_grid, finished),
                    rotational_histogram=(
                        np.asarray(submap.rotational_histogram) if finished else None
                    ),
                    **common,
                )
            )
        else:
            submaps.append(
                SubmapPayload(kind="2d", grid=_pack_grid(submap.grid, finished), **common)
            )
    if use_3d:
        return LocalSlamResultPayload(
            time=float(result.time),
            local_pose_t=np.asarray(result.local_pose.t, np.float64),
            local_pose_q=np.asarray(result.local_pose.q, np.float64),
            dim="3d",
            high_cloud=ir.high_resolution_cloud,
            low_cloud=ir.low_resolution_cloud,
            histogram=np.asarray(ir.rotational_histogram),
            gravity_alignment=(
                np.asarray(ir.gravity_alignment) if ir.gravity_alignment is not None else None
            ),
            submaps=tuple(submaps),
        )
    return LocalSlamResultPayload(
        time=float(result.time),
        local_pose_t=np.asarray(result.local_pose.t, np.float64),
        local_pose_q=np.asarray(result.local_pose.q, np.float64),
        dim="2d",
        cloud=ir.filtered_gravity_aligned_point_cloud,
        gravity_alignment=(
            np.asarray(ir.gravity_alignment) if ir.gravity_alignment is not None else None
        ),
        submaps=tuple(submaps),
    )


# -- uplink-side re-instantiation ---------------------------------------------


class SubmapController:
    """Re-creates/updates submaps from uploaded payloads on the uplink
    (ref: mapping/internal/submap_controller.h:29-60 UpdateSubmap — create
    unseen submaps, update known unfinished ones, drop from the unfinished
    set once the finishing payload arrives)."""

    def __init__(self):
        self._unfinished: Dict[Tuple[int, int], object] = {}

    def update_submap(self, trajectory_id: int, payload: SubmapPayload):
        from hectorgrapher_tpu.mapping.submap_2d import Submap2D
        from hectorgrapher_tpu.mapping.submap_3d import Submap3D
        from hectorgrapher_tpu.transform.np_quat import NpRigid3

        key = (trajectory_id, payload.submap_index)
        existing = self._unfinished.get(key)
        if existing is None:
            local_pose = NpRigid3(payload.local_pose_t, payload.local_pose_q)
            if payload.kind == "3d":
                hist_size_src = payload.rotational_histogram
                submap = Submap3D(
                    local_pose=local_pose,
                    high_resolution_grid=_unpack_grid(payload.high_grid),
                    low_resolution_grid=_unpack_grid(payload.low_grid),
                    rotational_histogram=(
                        np.asarray(hist_size_src)
                        if hist_size_src is not None
                        else np.zeros(128, np.float32)
                    ),
                    num_range_data=payload.num_range_data,
                    insertion_finished=payload.insertion_finished,
                )
            else:
                submap = Submap2D(
                    local_pose=local_pose,
                    grid=_unpack_grid(payload.grid),
                    num_range_data=payload.num_range_data,
                    insertion_finished=payload.insertion_finished,
                )
            if not payload.insertion_finished:
                self._unfinished[key] = submap
            return submap

    # The pose graph holds the same OBJECT; mutating it here flips
    # insertion_finished for _get_or_add_submap's finish detection.
        existing.num_range_data = payload.num_range_data
        if payload.insertion_finished:
            if payload.kind == "3d":
                existing.high_resolution_grid = _fill_grid(
                    existing.high_resolution_grid, payload.high_grid
                )
                existing.low_resolution_grid = _fill_grid(
                    existing.low_resolution_grid, payload.low_grid
                )
                existing.rotational_histogram = np.asarray(payload.rotational_histogram)
            else:
                existing.grid = _fill_grid(existing.grid, payload.grid)
            existing.insertion_finished = True
            del self._unfinished[key]
        return existing
