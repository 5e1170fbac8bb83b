"""Full reference-format pbstream state interop (VERDICT r2 #3).

Encodes/decodes the reference's COMPLETE mapping state — submaps with
grid payloads, trajectory node data with compressed clouds, trajectory
data — so that (a) a reference-produced `.pbstream` loads into our pose
graph as a frozen map for pure localization, and (b) `write_pbstream_state`
emits a stream whose record sequence and protos the reference's
deserializer accepts (ref: io/internal/mapping_state_serialization.cc
WritePbStream ordering: header -> PoseGraph -> AllTrajectoryBuilderOptions
-> Submap* -> Node* -> TrajectoryData* -> sensor data;
mapping/proto/serialization.proto SerializedData oneof).

Value codecs match the reference bit-for-bit:
- uint16 bounded-float codes: value = round((clamp(f)-lo)*32766/(hi-lo))+1
  in [1,32767], 0 = unknown (ref: probability_values.h:34-44
  BoundedFloatToValue; tsd_value_converter.h:39-55).
- Grid2D cell layout: flat = ix + iy*num_x_cells where
  ix = round((max.y-p.y)/res-0.5), iy = round((max.x-p.x)/res-0.5)
  (ref: 2d/map_limits.h GetCellIndex, 2d/grid_2d.h ToFlatIndex) — i.e.
  both axes REVERSED relative to our min-corner dense arrays.
- HybridGrid/HybridGridTSDF: sparse (x,y,z,value) voxel lists with
  zigzag-coded signed indices; cell center at index*resolution
  (ref: 3d/hybrid_grid.h GetCenterOfCell, proto/3d/hybrid_grid_tsdf.proto).
- CompressedPointCloud: 1mm raster, 10-bit block-relative packing
  (ref: sensor/compressed_point_cloud.cc; sensor/compression.py is
  wire-identical).

Known reference quirk, mirrored deliberately: HybridGridTSDF::ToProto
stores the ABSOLUTE max TSD in `relative_truncation_distance`
(hybrid_grid_tsdf.h:132 set_relative_truncation_distance(getMaxTSD()))
while FromProto multiplies the field by resolution again
(hybrid_grid_tsdf.h:68-71). We write and read ToProto's semantics
(absolute), so reference-PRODUCED files decode to the correct truncation
here, and our files read back exactly; the reference loading either file
applies its own quirk identically.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from hectorgrapher_tpu.io import protowire as pw
from hectorgrapher_tpu.io.pbstream import (
    MAGIC,
    PbConstraint,
    PbNodePose,
    PbState,
    encode_pose_graph,
    read_records,
    write_records,
)
from hectorgrapher_tpu.mapping import probability_values as pv
from hectorgrapher_tpu.sensor import compression
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.np_quat import NpRigid3

# common::Time epoch offset: ticks are 100ns since 0001-01-01; unix epoch
# is 62135596800 s later (ref: common/time.h kUtsEpochOffset...).
_EPOCH_OFFSET_TICKS = 62135596800 * 10**7


def seconds_to_ticks(t: float) -> int:
    return int(round(float(t) * 1e7)) + _EPOCH_OFFSET_TICKS


def ticks_to_seconds(ticks: int) -> float:
    return (int(ticks) - _EPOCH_OFFSET_TICKS) / 1e7


# ---------------------------------------------------------------------------
# Bounded-float <-> uint16 codes (ref: probability_values.h:34-44)
# ---------------------------------------------------------------------------


def encode_bounded(values, lo: float, hi: float, known) -> np.ndarray:
    """float -> codes 1..32767; unknown -> 0. Round half away from zero
    like common::RoundToInt (values after the clamp-shift are >= 0, so
    floor(x+0.5) is exact)."""
    f = np.clip(np.asarray(values, np.float64), lo, hi)
    codes = np.floor((f - lo) * (32766.0 / (hi - lo)) + 0.5).astype(np.int64) + 1
    return np.where(np.asarray(known, bool), codes, 0).astype(np.uint16)


def decode_bounded(codes, lo: float, hi: float, unknown: float) -> np.ndarray:
    """codes -> float: lo + (code-1)*scale; 0 -> unknown
    (ref: value_conversion_tables.cc table construction)."""
    codes = np.asarray(codes, np.int64)
    scale = (hi - lo) / 32766.0
    vals = lo + (codes - 1) * scale
    return np.where(codes > 0, vals, unknown).astype(np.float32)


# ---------------------------------------------------------------------------
# CompressedPointCloud proto (sensor.proto:33-36)
# ---------------------------------------------------------------------------


def encode_compressed_cloud(points: np.ndarray) -> bytes:
    stream, n = compression.compress(np.asarray(points, np.float64))
    return pw.emit_int(1, int(n)) + (
        pw.emit_bytes(3, pw.encode_packed_varints(stream)) if n else b""
    )


def decode_compressed_cloud(buf: bytes) -> np.ndarray:
    fd = pw.fields_to_dict(buf)
    n = int(pw.first(fd, 1, 0))
    if n == 0:
        return np.zeros((0, 3), np.float32)
    stream = pw.repeated_varints(fd, 3)
    # int32 negatives arrive sign-extended to 64 bits (already negative
    # after the int64 view); a 32-bit-truncated encoder's [2^31, 2^32)
    # values narrow here too.
    stream = np.where((stream >= 2**31) & (stream < 2**32), stream - 2**32, stream)
    return compression.decompress(stream.astype(np.int64), n)


def _cloud_to_padded(points: np.ndarray, min_pad: int = 64) -> PointCloud:
    from hectorgrapher_tpu.sensor.types import pad_cloud

    pad = min_pad
    while pad < len(points):
        pad *= 2
    return pad_cloud(np.asarray(points, np.float32), pad)


# ---------------------------------------------------------------------------
# Grid2D (proto/2d/grid_2d.proto + map_limits.proto + cell_limits.proto)
# ---------------------------------------------------------------------------


def _encode_map_limits(resolution: float, max_xy: np.ndarray, num_x: int, num_y: int) -> bytes:
    vec = pw.emit_double(1, float(max_xy[0])) + pw.emit_double(2, float(max_xy[1]))
    cells = pw.emit_int(1, num_x) + pw.emit_int(2, num_y)
    return (
        pw.emit_double(1, resolution)
        + pw.emit_message(2, vec)
        + pw.emit_message(3, cells)
    )


def _decode_map_limits(buf: bytes) -> Tuple[float, np.ndarray, int, int]:
    fd = pw.fields_to_dict(buf)
    res = pw.as_double(pw.first(fd, 1, 0))
    vec = pw.fields_to_dict(pw.first(fd, 2, b""))
    max_xy = np.array(
        [pw.as_double(pw.first(vec, 1, 0)), pw.as_double(pw.first(vec, 2, 0))]
    )
    cl = pw.fields_to_dict(pw.first(fd, 3, b""))
    return res, max_xy, int(pw.first(cl, 1, 0)), int(pw.first(cl, 2, 0))


def encode_grid_2d(grid, origin_t=None) -> bytes:
    """Our dense 2D grid -> reference Grid2D proto bytes.

    Our O[ox, oy] (min-corner ascending axes) maps to the reference's
    C[iy, ix] with ox = num_y-1-iy, oy = num_x-1-ix: C = O[::-1, ::-1]
    flattened with ix fastest (ref: grid_2d.h ToFlatIndex).

    origin_t: the submap origin (local_pose translation) — our grids live
    in the LOCAL frame, the reference's in the SUBMAP frame; the corner is
    rebased by -origin_t (exact: MapLimits.max is a double)."""
    from hectorgrapher_tpu.mapping.grids import (
        ProbabilityGrid,
        TSDFGrid,
        ensure_f32_grid,
    )

    grid = ensure_f32_grid(grid)
    nx, ny = int(grid.shape[0]), int(grid.shape[1])  # ours: (x cells, y cells)
    num_y, num_x = nx, ny  # reference: num_y_cells spans world x, num_x spans y
    res = float(np.asarray(grid.meta.resolution))
    mc = np.asarray(grid.meta.min_corner, np.float64)
    if origin_t is not None:
        mc = mc - np.asarray(origin_t, np.float64)[:2]
    max_xy = mc + np.array([nx * res, ny * res])

    if isinstance(grid, TSDFGrid):
        trunc = float(np.asarray(grid.truncation_distance))
        max_w = float(np.asarray(grid.max_weight))
        tsd = np.asarray(grid.tsd, np.float64)
        weight = np.asarray(grid.weight, np.float64)
        known = weight > 0
        cells = encode_bounded(tsd, -trunc, trunc, known)
        wcells = encode_bounded(weight, 0.0, max_w, known)
        cells_ref = cells[::-1, ::-1].reshape(-1)  # (num_y, num_x) row-major
        wcells_ref = wcells[::-1, ::-1].reshape(-1)
        sub = (
            pw.emit_float(1, trunc)
            + pw.emit_float(2, max_w)
            + pw.emit_bytes(3, pw.encode_packed_varints(wcells_ref))
        )
        body = (
            pw.emit_message(1, _encode_map_limits(res, max_xy, num_x, num_y))
            + pw.emit_bytes(2, pw.encode_packed_varints(cells_ref))
            + _encode_known_box(known[::-1, ::-1])
            + pw.emit_message(5, sub)
            + pw.emit_float(6, -trunc)
            + pw.emit_float(7, trunc)
        )
        return body

    assert isinstance(grid, ProbabilityGrid)
    p = np.asarray(grid.probability(), np.float64)
    known = np.asarray(grid.known, bool)
    cost = 1.0 - p  # ref: ProbabilityToCorrespondenceCost
    cells = encode_bounded(cost, pv.MIN_PROBABILITY, pv.MAX_PROBABILITY, known)
    cells_ref = cells[::-1, ::-1].reshape(-1)
    body = (
        pw.emit_message(1, _encode_map_limits(res, max_xy, num_x, num_y))
        + pw.emit_bytes(2, pw.encode_packed_varints(cells_ref))
        + _encode_known_box(known[::-1, ::-1])
        + pw.emit_message(4, b"")  # oneof: probability_grid_2d (empty msg)
        + pw.emit_float(6, float(pv.MIN_PROBABILITY))
        + pw.emit_float(7, float(pv.MAX_PROBABILITY))
    )
    return body


def _encode_known_box(known_ref: np.ndarray) -> bytes:
    """CellBox over the reference-layout known mask (C[iy, ix]); indices
    are (ix, iy) per Grid2D::known_cells_box (Eigen AlignedBox2i of cell
    indices, x component = ix)."""
    iy, ix = np.nonzero(known_ref)
    if len(ix) == 0:
        return b""
    box = (
        pw.emit_int(1, int(ix.max()))
        + pw.emit_int(2, int(iy.max()))
        + pw.emit_int(3, int(ix.min()))
        + pw.emit_int(4, int(iy.min()))
    )
    return pw.emit_message(3, box)


def decode_grid_2d(buf: bytes):
    """Reference Grid2D proto -> our dense ProbabilityGrid / TSDFGrid."""
    import jax.numpy as jnp

    from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid, TSDFGrid

    fd = pw.fields_to_dict(buf)
    res, max_xy, num_x, num_y = _decode_map_limits(pw.first(fd, 1, b""))
    codes = pw.repeated_varints(fd, 2).astype(np.int64)
    if codes.size != num_x * num_y:
        raise ValueError(f"Grid2D cells {codes.size} != {num_x}*{num_y}")
    C = codes.reshape(num_y, num_x)
    O_codes = C[::-1, ::-1]  # ours: (nx, ny) = (num_y, num_x)
    min_corner = np.array([max_xy[0] - num_y * res, max_xy[1] - num_x * res])
    meta = GridMeta(
        resolution=jnp.asarray(res, jnp.float32),
        min_corner=jnp.asarray(min_corner, jnp.float32),
    )
    min_cc = pw.as_float(pw.first(fd, 6, 0))
    max_cc = pw.as_float(pw.first(fd, 7, 0))
    if min_cc == 0.0 and max_cc == 0.0:  # ref: grid_2d.cc:22-44 legacy default
        min_cc, max_cc = float(pv.MIN_PROBABILITY), float(pv.MAX_PROBABILITY)

    if 5 in fd:  # TSDF2D
        sub = pw.fields_to_dict(fd[5][0])
        trunc = pw.as_float(pw.first(sub, 1, 0))
        max_w = pw.as_float(pw.first(sub, 2, 0))
        wcodes = pw.repeated_varints(sub, 3).astype(np.int64).reshape(num_y, num_x)[::-1, ::-1]
        tsd = decode_bounded(O_codes, -trunc, trunc, trunc)
        weight = decode_bounded(wcodes, 0.0, max_w, 0.0)
        return TSDFGrid(
            tsd=jnp.asarray(tsd),
            weight=jnp.asarray(weight),
            truncation_distance=jnp.asarray(trunc, jnp.float32),
            max_weight=jnp.asarray(max_w, jnp.float32),
            meta=meta,
        )

    cost = decode_bounded(O_codes, min_cc, max_cc, float(pv.MAX_PROBABILITY))
    p = np.clip(1.0 - cost, 1e-6, 1.0 - 1e-6)
    known = O_codes > 0
    log_odds = np.where(known, np.log(p / (1.0 - p)), 0.0).astype(np.float32)
    return ProbabilityGrid(
        log_odds=jnp.asarray(log_odds), known=jnp.asarray(known), meta=meta
    )


# ---------------------------------------------------------------------------
# HybridGrid / HybridGridTSDF (proto/3d/hybrid_grid*.proto)
# ---------------------------------------------------------------------------

_MAX_DENSE_CELLS = 1 << 28  # decode guard: refuse absurd bounding boxes


def encode_hybrid_tsdf(grid, origin_t=None) -> bytes:
    """Our dense 3D TSDFGrid -> HybridGridTSDF voxel lists. Only known
    (weight code > 0) voxels are emitted, like the reference's iterator.

    origin_t rebases from our LOCAL frame into the reference's SUBMAP
    frame. The proto's integer index space puts voxel centers at
    index*resolution (ref: hybrid_grid.h GetCenterOfCell); a grid whose
    lattice is off that raster is snapped to the nearest lattice — a rigid
    sub-half-voxel translation. ActiveSubmaps3D aligns its grids at
    creation, so production exports are lossless; only hand-built grids
    pay the snap."""
    from hectorgrapher_tpu.mapping.grids import ensure_f32_grid

    grid = ensure_f32_grid(grid)
    res = float(np.asarray(grid.meta.resolution))
    trunc = float(np.asarray(grid.truncation_distance))
    max_w = float(np.asarray(grid.max_weight))
    tsd = np.asarray(grid.tsd, np.float64)
    weight = np.asarray(grid.weight, np.float64)
    known = weight > 0
    xi, yi, zi = np.nonzero(known)
    # our cell center = min_corner + (i+0.5)*res; ref center = index*res
    mc = np.asarray(grid.meta.min_corner, np.float64)
    if origin_t is not None:
        mc = mc - np.asarray(origin_t, np.float64)
    base = np.round(mc / res + 0.5).astype(np.int64)
    tsd_codes = encode_bounded(tsd[xi, yi, zi], -trunc, trunc, True)
    w_codes = encode_bounded(weight[xi, yi, zi], 0.0, max_w, True)
    return (
        pw.emit_float(1, res)
        + pw.emit_bytes(3, pw.encode_packed_varints(pw.zigzag_encode(xi + base[0])))
        + pw.emit_bytes(4, pw.encode_packed_varints(pw.zigzag_encode(yi + base[1])))
        + pw.emit_bytes(5, pw.encode_packed_varints(pw.zigzag_encode(zi + base[2])))
        + pw.emit_bytes(6, pw.encode_packed_varints(tsd_codes))
        + pw.emit_bytes(7, pw.encode_packed_varints(w_codes))
        # ToProto quirk: absolute max TSD in this field (see module doc).
        + pw.emit_float(8, trunc)
        + pw.emit_float(9, max_w)
    )


def decode_hybrid_tsdf(buf: bytes):
    import jax.numpy as jnp

    from hectorgrapher_tpu.mapping.grids import GridMeta, TSDFGrid

    fd = pw.fields_to_dict(buf)
    res = pw.as_float(pw.first(fd, 1, 0))
    xs = pw.zigzag_decode(pw.repeated_varints(fd, 3))
    ys = pw.zigzag_decode(pw.repeated_varints(fd, 4))
    zs = pw.zigzag_decode(pw.repeated_varints(fd, 5))
    tsd_codes = pw.repeated_varints(fd, 6)
    w_codes = pw.repeated_varints(fd, 7)
    trunc = pw.as_float(pw.first(fd, 8, 0))
    max_w = pw.as_float(pw.first(fd, 9, 0))
    return _dense_from_voxels(
        res, xs, ys, zs,
        decode_bounded(tsd_codes, -trunc, trunc, trunc),
        decode_bounded(w_codes, 0.0, max_w, 0.0),
        trunc, max_w, jnp, GridMeta, TSDFGrid,
    )


def _dense_from_voxels(res, xs, ys, zs, tsd_vals, w_vals, trunc, max_w, jnp, GridMeta, TSDFGrid):
    if len(xs) == 0:
        lo = np.zeros(3, np.int64)
        shape = (2, 2, 2)
    else:
        lo = np.array([xs.min(), ys.min(), zs.min()])
        hi = np.array([xs.max(), ys.max(), zs.max()])
        shape = tuple(int(v) for v in hi - lo + 1)
        if int(np.prod(shape)) > _MAX_DENSE_CELLS:
            raise ValueError(f"hybrid grid bounding box too large: {shape}")
    tsd = np.full(shape, trunc, np.float32)
    weight = np.zeros(shape, np.float32)
    if len(xs):
        tsd[xs - lo[0], ys - lo[1], zs - lo[2]] = tsd_vals
        weight[xs - lo[0], ys - lo[1], zs - lo[2]] = w_vals
    min_corner = (lo - 0.5) * res
    return TSDFGrid(
        tsd=jnp.asarray(tsd),
        weight=jnp.asarray(weight),
        truncation_distance=jnp.asarray(trunc, jnp.float32),
        max_weight=jnp.asarray(max_w, jnp.float32),
        meta=GridMeta(
            resolution=jnp.asarray(res, jnp.float32),
            min_corner=jnp.asarray(min_corner, jnp.float32),
        ),
    )


def encode_hybrid_occupancy(grid, origin_t=None) -> bytes:
    """Our dense 3D ProbabilityGrid -> HybridGrid probability-code lists
    (frame/lattice semantics as encode_hybrid_tsdf)."""
    from hectorgrapher_tpu.mapping.grids import ensure_f32_grid

    grid = ensure_f32_grid(grid)
    res = float(np.asarray(grid.meta.resolution))
    p = np.asarray(grid.probability(), np.float64)
    known = np.asarray(grid.known, bool)
    xi, yi, zi = np.nonzero(known)
    mc = np.asarray(grid.meta.min_corner, np.float64)
    if origin_t is not None:
        mc = mc - np.asarray(origin_t, np.float64)
    base = np.round(mc / res + 0.5).astype(np.int64)
    codes = encode_bounded(
        p[xi, yi, zi], float(pv.MIN_PROBABILITY), float(pv.MAX_PROBABILITY), True
    )
    return (
        pw.emit_float(1, res)
        + pw.emit_bytes(3, pw.encode_packed_varints(pw.zigzag_encode(xi + base[0])))
        + pw.emit_bytes(4, pw.encode_packed_varints(pw.zigzag_encode(yi + base[1])))
        + pw.emit_bytes(5, pw.encode_packed_varints(pw.zigzag_encode(zi + base[2])))
        + pw.emit_bytes(6, pw.encode_packed_varints(codes))
    )


def decode_hybrid_occupancy(buf: bytes):
    import jax.numpy as jnp

    from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid

    fd = pw.fields_to_dict(buf)
    res = pw.as_float(pw.first(fd, 1, 0))
    xs = pw.zigzag_decode(pw.repeated_varints(fd, 3))
    ys = pw.zigzag_decode(pw.repeated_varints(fd, 4))
    zs = pw.zigzag_decode(pw.repeated_varints(fd, 5))
    codes = pw.repeated_varints(fd, 6)
    p = decode_bounded(
        codes, float(pv.MIN_PROBABILITY), float(pv.MAX_PROBABILITY), 0.5
    )
    if len(xs) == 0:
        lo = np.zeros(3, np.int64)
        shape = (2, 2, 2)
    else:
        lo = np.array([xs.min(), ys.min(), zs.min()])
        hi = np.array([xs.max(), ys.max(), zs.max()])
        shape = tuple(int(v) for v in hi - lo + 1)
        if int(np.prod(shape)) > _MAX_DENSE_CELLS:
            raise ValueError(f"hybrid grid bounding box too large: {shape}")
    log_odds = np.zeros(shape, np.float32)
    known = np.zeros(shape, bool)
    if len(xs):
        pc = np.clip(p, 1e-6, 1 - 1e-6)
        log_odds[xs - lo[0], ys - lo[1], zs - lo[2]] = np.log(pc / (1 - pc))
        known[xs - lo[0], ys - lo[1], zs - lo[2]] = True
    min_corner = (lo - 0.5) * res
    return ProbabilityGrid(
        log_odds=jnp.asarray(log_odds),
        known=jnp.asarray(known),
        meta=GridMeta(
            resolution=jnp.asarray(res, jnp.float32),
            min_corner=jnp.asarray(min_corner, jnp.float32),
        ),
    )


# ---------------------------------------------------------------------------
# Submap / Node records (serialization.proto + submap.proto +
# trajectory_node_data.proto)
# ---------------------------------------------------------------------------


def encode_submap_record(trajectory_id: int, submap_index: int, pg_submap) -> bytes:
    """SerializedData{submap=3} record bytes."""
    from hectorgrapher_tpu.mapping.grids import TSDFGrid
    from hectorgrapher_tpu.mapping.submap_3d import Submap3D

    submap = pg_submap.submap
    sid = pw.emit_int(1, trajectory_id) + pw.emit_int(2, submap_index)
    # Our grids live in the LOCAL frame; the reference's in the SUBMAP
    # frame. Rebase by local_pose — translation-only in our submaps
    # (submap_3d.py _add_submap); a rotated local_pose would need grid
    # resampling, which the dense representation cannot express.
    q = np.asarray(submap.local_pose.q, np.float64)
    if abs(abs(q[0]) - 1.0) > 1e-6:
        raise ValueError(
            "pbstream export requires translation-only submap local_pose "
            "(grid resampling under rotation is not supported)"
        )
    origin_t = np.asarray(submap.local_pose.t, np.float64)
    if isinstance(submap, Submap3D):
        hi = submap.high_resolution_grid
        lo = submap.low_resolution_grid
        if isinstance(hi, TSDFGrid) or (hasattr(hi, "tsd")):
            hi_field, hi_body = 7, encode_hybrid_tsdf(hi, origin_t)
            lo_field, lo_body = 8, encode_hybrid_tsdf(lo, origin_t)
        else:
            hi_field, hi_body = 4, encode_hybrid_occupancy(hi, origin_t)
            lo_field, lo_body = 5, encode_hybrid_occupancy(lo, origin_t)
        body = (
            pw.emit_message(1, pw.encode_rigid3d(submap.local_pose))
            + pw.emit_int(2, int(submap.num_range_data))
            + (pw.emit_int(3, 1) if pg_submap.finished else b"")
            + pw.emit_message(hi_field, hi_body)
            + pw.emit_message(lo_field, lo_body)
            + pw.emit_bytes(
                6, pw.encode_packed_floats(np.asarray(submap.rotational_histogram))
            )
        )
        sub = pw.emit_message(3, body)  # Submap.submap_3d
    else:
        body = (
            pw.emit_message(1, pw.encode_rigid3d(submap.local_pose))
            + pw.emit_int(2, int(submap.num_range_data))
            + (pw.emit_int(3, 1) if pg_submap.finished else b"")
            + pw.emit_message(4, encode_grid_2d(submap.grid, origin_t))
        )
        sub = pw.emit_message(2, body)  # Submap.submap_2d
    return pw.emit_message(3, pw.emit_message(1, sid) + sub)


def decode_submap_record(buf: bytes) -> dict:
    """Submap proto bytes -> dict with id + our submap objects' parts."""
    fd = pw.fields_to_dict(buf)
    sid = pw.fields_to_dict(pw.first(fd, 1, b""))
    out = {
        "trajectory_id": int(pw.first(sid, 1, 0)),
        "submap_index": int(pw.first(sid, 2, 0)),
    }
    if 2 in fd:  # Submap2D
        sd = pw.fields_to_dict(fd[2][0])
        out["kind"] = "2d"
        out["local_pose"] = pw.decode_rigid3d(pw.first(sd, 1, b""))
        out["num_range_data"] = int(pw.first(sd, 2, 0))
        out["finished"] = bool(int(pw.first(sd, 3, 0)))
        out["grid"] = decode_grid_2d(pw.first(sd, 4, b""))
    elif 3 in fd:  # Submap3D
        sd = pw.fields_to_dict(fd[3][0])
        out["kind"] = "3d"
        out["local_pose"] = pw.decode_rigid3d(pw.first(sd, 1, b""))
        out["num_range_data"] = int(pw.first(sd, 2, 0))
        out["finished"] = bool(int(pw.first(sd, 3, 0)))
        if 7 in sd:
            out["high_grid"] = decode_hybrid_tsdf(sd[7][0])
        elif 4 in sd:
            out["high_grid"] = decode_hybrid_occupancy(sd[4][0])
        if 8 in sd:
            out["low_grid"] = decode_hybrid_tsdf(sd[8][0])
        elif 5 in sd:
            out["low_grid"] = decode_hybrid_occupancy(sd[5][0])
        out["histogram"] = pw.repeated_floats(sd, 6)
    return out


def encode_node_record(trajectory_id: int, node_index: int, node) -> bytes:
    """SerializedData{node=4} record bytes from a PgNode."""
    nid = pw.emit_int(1, trajectory_id) + pw.emit_int(2, node_index)
    data = pw.emit_int(1, seconds_to_ticks(node.time))
    if node.gravity_alignment is not None:
        data += pw.emit_message(
            2, pw.encode_quaterniond(np.asarray(node.gravity_alignment))
        )
    if node.cloud is not None:
        pts = np.asarray(node.cloud.positions)[np.asarray(node.cloud.mask)]
        data += pw.emit_message(3, encode_compressed_cloud(pts))
    if node.high_cloud is not None:
        pts = np.asarray(node.high_cloud.positions)[np.asarray(node.high_cloud.mask)]
        data += pw.emit_message(4, encode_compressed_cloud(pts))
    if node.low_cloud is not None:
        pts = np.asarray(node.low_cloud.positions)[np.asarray(node.low_cloud.mask)]
        data += pw.emit_message(5, encode_compressed_cloud(pts))
    if node.histogram is not None:
        data += pw.emit_bytes(6, pw.encode_packed_floats(np.asarray(node.histogram)))
    data += pw.emit_message(7, pw.encode_rigid3d(node.local_pose))
    return pw.emit_message(4, pw.emit_message(1, nid) + pw.emit_message(5, data))


def decode_node_record(buf: bytes) -> dict:
    fd = pw.fields_to_dict(buf)
    nid = pw.fields_to_dict(pw.first(fd, 1, b""))
    out = {
        "trajectory_id": int(pw.first(nid, 1, 0)),
        "node_index": int(pw.first(nid, 2, 0)),
    }
    nd = pw.fields_to_dict(pw.first(fd, 5, b""))
    out["time"] = ticks_to_seconds(int(pw.first(nd, 1, 0)))
    if 2 in nd:
        out["gravity_alignment"] = pw.decode_quaterniond(nd[2][0])
    if 3 in nd:
        out["cloud"] = decode_compressed_cloud(nd[3][0])
    if 4 in nd:
        out["high_cloud"] = decode_compressed_cloud(nd[4][0])
    if 5 in nd:
        out["low_cloud"] = decode_compressed_cloud(nd[5][0])
    hist = pw.repeated_floats(nd, 6)
    if hist.size:
        out["histogram"] = hist
    if 7 in nd:
        out["local_pose"] = pw.decode_rigid3d(nd[7][0])
    return out


# ---------------------------------------------------------------------------
# Whole-state write / load
# ---------------------------------------------------------------------------


def write_pbstream_state(pose_graph, path: str) -> None:
    """Serialize the pose graph into the reference's pbstream layout
    (ref: mapping_state_serialization.cc WritePbStream record order)."""
    import contextlib

    lock = getattr(pose_graph, "_lock", None) or contextlib.nullcontext()
    with lock:
        _write_pbstream_state_locked(pose_graph, path)


def _write_pbstream_state_locked(pose_graph, path: str) -> None:
    # Per-trajectory indices (the reference's NodeId/SubmapId are
    # per-trajectory; our lists are global).
    node_tid_idx: List[Tuple[int, int]] = []
    counters: Dict[int, int] = {}
    for node in pose_graph.nodes:
        k = counters.get(node.trajectory_id, 0)
        node_tid_idx.append((node.trajectory_id, k))
        counters[node.trajectory_id] = k + 1
    submap_tid_idx: List[Tuple[int, int]] = []
    counters = {}
    for s in pose_graph.submaps:
        k = counters.get(s.trajectory_id, 0)
        submap_tid_idx.append((s.trajectory_id, k))
        counters[s.trajectory_id] = k + 1

    # PoseGraph record via the existing encoder.
    state = PbState(format_version=2)
    for c in pose_graph.constraints:
        st, si = submap_tid_idx[c.submap_index]
        nt, ni = node_tid_idx[c.node_index]
        state.constraints.append(
            PbConstraint(
                submap_trajectory_id=st,
                submap_index=si,
                node_trajectory_id=nt,
                node_index=ni,
                relative_pose=c.zbar,
                translation_weight=c.translation_weight,
                rotation_weight=c.rotation_weight,
                tag="INTER_SUBMAP" if c.tag == "INTER" else "INTRA_SUBMAP",
            )
        )
    for i, node in enumerate(pose_graph.nodes):
        tid, idx = node_tid_idx[i]
        state.nodes.append(
            PbNodePose(
                trajectory_id=tid,
                node_index=idx,
                timestamp=seconds_to_ticks(node.time),
                pose=node.global_pose,
            )
        )
    for i, s in enumerate(pose_graph.submaps):
        tid, idx = submap_tid_idx[i]
        state.submap_poses.append(
            {"trajectory_id": tid, "submap_index": idx, "pose": s.global_pose}
        )
    for name, pose in getattr(pose_graph, "_landmark_poses", {}).items():
        state.landmark_poses[name] = pose

    records = [pw.emit_int(1, 2)]  # SerializationHeader{format_version: 2}
    records.append(pw.emit_message(1, encode_pose_graph(state)))
    # AllTrajectoryBuilderOptions: one (empty) entry per trajectory —
    # the deserializer CHECKs the count matches the trajectory count
    # (ref: proto_stream_deserializer.cc).
    tids = sorted({t for t, _ in node_tid_idx} | {t for t, _ in submap_tid_idx})
    all_opts = b"".join(pw.emit_message(1, b"") for _ in tids)
    records.append(pw.emit_message(2, all_opts))
    for i, s in enumerate(pose_graph.submaps):
        tid, idx = submap_tid_idx[i]
        records.append(encode_submap_record(tid, idx, s))
    for i, node in enumerate(pose_graph.nodes):
        tid, idx = node_tid_idx[i]
        records.append(encode_node_record(tid, idx, node))
    if hasattr(pose_graph, "_histogram_size"):  # 3D: TrajectoryData records
        for tid in tids:
            body = pw.emit_int(1, tid) + pw.emit_double(2, 9.806)
            records.append(pw.emit_message(5, body))
    write_records(path, records)


def sniff_dim(path: str) -> int:
    """2 or 3: the dimensionality of a pbstream state's submaps (decides
    which pose-graph class to instantiate, like map_builder.cc dispatches
    on the options' use_trajectory_builder_3d)."""
    from hectorgrapher_tpu.io.pbstream import SERIALIZED_DATA_KINDS

    for i, record in enumerate(read_records(path)):
        if i == 0:
            continue
        fd = pw.fields_to_dict(record)
        for fieldno in fd:
            if SERIALIZED_DATA_KINDS.get(fieldno) == "submap":
                sub = pw.fields_to_dict(fd[fieldno][0])
                if 3 in sub:
                    return 3
                if 2 in sub:
                    return 2
    return 2


def load_pbstream_state(pose_graph, path: str, load_frozen_state: bool = True) -> Dict[int, int]:
    """Load a reference-format pbstream state into our pose graph
    (ref: map_builder.cc LoadState:227-404 — trajectory remapping, node/
    submap replay, constraint re-add, FreezeTrajectory). Returns the
    trajectory id remap {serialized: new}."""
    import contextlib

    from hectorgrapher_tpu.io.pbstream import SERIALIZED_DATA_KINDS, _decode_pose_graph
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
        Constraint,
        PgNode,
        PgSubmap,
        TrajectoryState,
    )
    from hectorgrapher_tpu.mapping.submap_2d import Submap2D
    from hectorgrapher_tpu.mapping.submap_3d import Submap3D

    pg_state = PbState()
    submaps: List[dict] = []
    nodes: List[dict] = []
    for i, record in enumerate(read_records(path)):
        if i == 0:
            fd = pw.fields_to_dict(record)
            pg_state.format_version = int(pw.first(fd, 1, 0))
            continue
        fd = pw.fields_to_dict(record)
        for fieldno in fd:
            kind = SERIALIZED_DATA_KINDS.get(fieldno)
            if kind == "pose_graph":
                _decode_pose_graph(fd[fieldno][0], pg_state)
            elif kind == "submap":
                submaps.append(decode_submap_record(fd[fieldno][0]))
            elif kind == "node":
                nodes.append(decode_node_record(fd[fieldno][0]))

    node_pose = {
        (n.trajectory_id, n.node_index): n for n in pg_state.nodes
    }
    submap_pose = {
        (s["trajectory_id"], s["submap_index"]): s["pose"]
        for s in pg_state.submap_poses
    }

    lock = getattr(pose_graph, "_lock", None) or contextlib.nullcontext()
    with lock:
        old_ids = sorted(
            {s["trajectory_id"] for s in submaps} | {n["trajectory_id"] for n in nodes}
        )
        base = max(pose_graph._trajectory_states.keys(), default=-1) + 1
        remap = {old: base + i for i, old in enumerate(old_ids)}

        node_global_index: Dict[Tuple[int, int], int] = {}
        for nd in sorted(nodes, key=lambda d: (d["trajectory_id"], d["node_index"])):
            pose_entry = node_pose.get((nd["trajectory_id"], nd["node_index"]))
            global_pose = pose_entry.pose if pose_entry else nd.get("local_pose", NpRigid3.identity())
            node = PgNode(
                time=nd["time"],
                local_pose=nd.get("local_pose", global_pose),
                global_pose=global_pose,
                trajectory_id=remap[nd["trajectory_id"]],
                cloud=_cloud_to_padded(nd["cloud"]) if "cloud" in nd else None,
                high_cloud=_cloud_to_padded(nd["high_cloud"]) if "high_cloud" in nd else None,
                low_cloud=_cloud_to_padded(nd["low_cloud"]) if "low_cloud" in nd else None,
                histogram=nd.get("histogram"),
                gravity_alignment=nd.get("gravity_alignment"),
            )
            node.node_id = pose_graph._next_node_id
            pose_graph._next_node_id += 1
            node_global_index[(nd["trajectory_id"], nd["node_index"])] = len(pose_graph.nodes)
            pose_graph._node_index_by_id[node.node_id] = len(pose_graph.nodes)
            pose_graph.nodes.append(node)

        submap_global_index: Dict[Tuple[int, int], int] = {}
        for sd in sorted(submaps, key=lambda d: (d["trajectory_id"], d["submap_index"])):
            # Decoded grids are in the SUBMAP frame. Our matcher/zbar math
            # is frame-consistent when the stored local_pose is identity:
            # node_in_grid = local_pose o (submap_global^-1 o node_global)
            # = node-in-submap, and zbar = local_pose^-1 o refined =
            # node-in-submap — exactly the constraint's definition. This
            # also handles reference maps whose local_pose carries the
            # gravity-alignment ROTATION (submap_3d.cc), which a dense
            # axis-aligned array could not rebase without resampling.
            if sd["kind"] == "3d":
                submap = Submap3D(
                    local_pose=NpRigid3.identity(),
                    high_resolution_grid=sd["high_grid"],
                    low_resolution_grid=sd["low_grid"],
                    rotational_histogram=np.asarray(sd["histogram"], np.float32),
                    num_range_data=sd["num_range_data"],
                    insertion_finished=sd["finished"],
                )
            else:
                submap = Submap2D(
                    local_pose=NpRigid3.identity(),
                    grid=sd["grid"],
                    num_range_data=sd["num_range_data"],
                    insertion_finished=sd["finished"],
                )
            pg_submap = PgSubmap(
                submap=submap,
                global_pose=submap_pose.get(
                    (sd["trajectory_id"], sd["submap_index"]), sd["local_pose"]
                ),
                trajectory_id=remap[sd["trajectory_id"]],
                finished=sd["finished"],
            )
            pg_submap.submap_id = pose_graph._next_submap_id
            pose_graph._next_submap_id += 1
            submap_global_index[(sd["trajectory_id"], sd["submap_index"])] = len(pose_graph.submaps)
            pose_graph._submap_index_by_id[pg_submap.submap_id] = len(pose_graph.submaps)
            pose_graph._submap_ids[id(submap)] = len(pose_graph.submaps)
            pose_graph.submaps.append(pg_submap)

        for c in pg_state.constraints:
            si = submap_global_index.get((c.submap_trajectory_id, c.submap_index))
            ni = node_global_index.get((c.node_trajectory_id, c.node_index))
            if si is None or ni is None:
                continue
            pose_graph.constraints.append(
                Constraint(
                    submap_index=si,
                    node_index=ni,
                    zbar=c.relative_pose,
                    translation_weight=c.translation_weight,
                    rotation_weight=c.rotation_weight,
                    tag="INTER" if c.tag == "INTER_SUBMAP" else "INTRA",
                )
            )

        for old, new in remap.items():
            pose_graph._trajectory_states[new] = (
                TrajectoryState.FROZEN if load_frozen_state else TrajectoryState.FINISHED
            )
    return remap
