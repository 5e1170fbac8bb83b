"""Checkpoint serialization: save/load full SLAM state.

Logical schema mirrors the reference's pbstream ordering
(ref: cartographer/io/internal/mapping_state_serialization.cc —
header(version) -> PoseGraph (submap poses, node poses, constraints) ->
options fingerprint -> submap payloads -> node payloads -> trajectory
data; proto_stream.cc's gzip container becomes a compressed .npz).

Resume modes (ref: map_builder.cc LoadState:227-404):
  * full: constraints re-added, optimization continues
  * frozen (load_frozen_state): trajectory FROZEN — poses held constant in
    SPA; used for pure localization against a prior map.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.mapping.grids import GridMeta, ProbabilityGrid, TSDFGrid
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
    Constraint,
    PgNode,
    PgSubmap,
    TrajectoryState,
)
from hectorgrapher_tpu.mapping.submap_2d import Submap2D
from hectorgrapher_tpu.mapping.submap_3d import Submap3D
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.np_quat import NpRigid3

SERIALIZATION_VERSION = 2  # matches the reference's current format version
MAGIC = "hectorgrapher_tpu_state"


def migrate_state_v1_to_v2(in_path: str, out_path: str) -> int:
    """Migrate a version-1 state file to version 2.

    Version 1 predates per-submap rotational histograms; the migration
    recomputes each 3D submap's histogram as the sum of the histograms of
    the nodes constrained INTRA to it — the same recomputation the
    reference performs (ref: io/serialization_format_migration.cc
    MigrateSubmapFormatVersion1ToVersion2, invoked from
    map_builder.cc:366-373). Returns the number of submaps migrated.
    """
    with np.load(in_path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files if k != "__index__"}
        index = json.loads(bytes(data["__index__"]).decode())
    if index["magic"] != MAGIC:
        raise ValueError("not a hectorgrapher_tpu state file")
    if index["version"] >= SERIALIZATION_VERSION:
        raise ValueError(f"state already at version {index['version']}")

    migrated = _recompute_missing_submap_histograms(index, arrays)
    index["version"] = SERIALIZATION_VERSION
    arrays["__index__"] = np.frombuffer(json.dumps(index).encode(), dtype=np.uint8)
    np.savez_compressed(out_path, **arrays)
    return migrated


def _recompute_missing_submap_histograms(index: Dict, arrays: Dict) -> int:
    """Shared by the migrate CLI and v1 in-memory loads."""
    intra: Dict[int, List[int]] = {}
    for c in index["constraints"]:
        if c["tag"] == "INTRA":
            intra.setdefault(c["submap_index"], []).append(c["node_index"])
    migrated = 0
    for i, entry in enumerate(index["submaps"]):
        if entry.get("kind") != "3d" or f"submap{i}_histogram" in arrays:
            continue
        hist = None
        for ni in intra.get(i, []):
            node_hist = arrays.get(f"node{ni}_histogram")
            if node_hist is not None:
                hist = node_hist if hist is None else hist + node_hist
        if hist is None:
            # No node data to recompute from: an empty histogram, exactly
            # like the reference's migration of submaps without nodes.
            size = next(
                (arrays[k].shape[0] for k in arrays if k.endswith("_histogram")), 128
            )
            hist = np.zeros(size, np.float32)
        arrays[f"submap{i}_histogram"] = np.asarray(hist, np.float32)
        migrated += 1
    return migrated


def _rigid_to_arr(p: NpRigid3) -> np.ndarray:
    return np.concatenate([np.asarray(p.t, np.float64), np.asarray(p.q, np.float64)])


def _rigid_from_arr(a) -> NpRigid3:
    return NpRigid3(np.asarray(a[:3]), np.asarray(a[3:7]))


def _grid_payload(prefix: str, grid, out: Dict[str, np.ndarray]) -> Dict:
    meta = {"resolution": float(grid.meta.resolution)}
    out[f"{prefix}_min_corner"] = np.asarray(grid.meta.min_corner)
    if isinstance(grid, TSDFGrid):
        if grid.tsd.dtype == jnp.uint16:
            # uint16-quantized submap: store the codes verbatim (the
            # reference's pbstream stores uint16 cells, hybrid_grid_tsdf.h).
            out[f"{prefix}_tsd"] = np.asarray(grid.tsd)
            out[f"{prefix}_weight"] = np.asarray(grid.weight)
            meta["quantized"] = True
        else:
            out[f"{prefix}_tsd"] = np.asarray(grid.tsd, np.float16)
            out[f"{prefix}_weight"] = np.asarray(grid.weight, np.float16)
        meta["type"] = "tsdf"
        meta["truncation_distance"] = float(grid.truncation_distance)
        meta["max_weight"] = float(grid.max_weight)
    else:
        if grid.log_odds.dtype == jnp.uint16:
            out[f"{prefix}_log_odds"] = np.asarray(grid.log_odds)
            meta["quantized"] = True
        else:
            out[f"{prefix}_log_odds"] = np.asarray(grid.log_odds, np.float16)
        out[f"{prefix}_known"] = np.asarray(grid.known)
        meta["type"] = "probability"
    return meta


def _grid_from_payload(prefix: str, meta: Dict, data) -> object:
    gmeta = GridMeta(
        resolution=jnp.asarray(meta["resolution"], jnp.float32),
        min_corner=jnp.asarray(data[f"{prefix}_min_corner"], jnp.float32),
    )
    quantized = bool(meta.get("quantized", False))
    if meta["type"] == "tsdf":
        dt = jnp.uint16 if quantized else jnp.float32
        return TSDFGrid(
            tsd=jnp.asarray(data[f"{prefix}_tsd"], dt),
            weight=jnp.asarray(data[f"{prefix}_weight"], dt),
            truncation_distance=jnp.asarray(meta["truncation_distance"], jnp.float32),
            max_weight=jnp.asarray(meta["max_weight"], jnp.float32),
            meta=gmeta,
        )
    return ProbabilityGrid(
        log_odds=jnp.asarray(data[f"{prefix}_log_odds"], jnp.uint16 if quantized else jnp.float32),
        known=jnp.asarray(data[f"{prefix}_known"]),
        meta=gmeta,
    )


def _cloud_payload(prefix: str, cloud: Optional[PointCloud], out: Dict) -> bool:
    if cloud is None:
        return False
    out[f"{prefix}_positions"] = np.asarray(cloud.positions, np.float32)
    out[f"{prefix}_mask"] = np.asarray(cloud.mask)
    return True


def _cloud_from_payload(prefix: str, data) -> Optional[PointCloud]:
    key = f"{prefix}_positions"
    if key not in data:
        return None
    return PointCloud(positions=jnp.asarray(data[key]), mask=jnp.asarray(data[f"{prefix}_mask"]))


import contextlib


def save_state(pose_graph, path: str) -> None:
    """Serialize the pose graph (nodes, submaps, constraints) to .npz.

    Takes the pose graph's host lock (if present) for the whole snapshot:
    with the async work queue, a background constraint append between the
    index pass and the zbar pass would desynchronize
    index['constraints'] from constraint_zbars."""
    lock = getattr(pose_graph, "_lock", None) or contextlib.nullcontext()
    with lock:
        _save_state_locked(pose_graph, path)


def _save_state_locked(pose_graph, path: str) -> None:
    arrays: Dict[str, np.ndarray] = {}
    index: Dict = {
        "magic": MAGIC,
        "version": SERIALIZATION_VERSION,
        "dim": 3 if hasattr(pose_graph, "_histogram_size") else 2,
        "nodes": [],
        "submaps": [],
        "constraints": [],
        "trajectory_states": {
            str(k): v.name for k, v in pose_graph._trajectory_states.items()
        },
    }

    for i, node in enumerate(pose_graph.nodes):
        entry = {
            "time": node.time,
            "trajectory_id": node.trajectory_id,
            "has_histogram": node.histogram is not None,
        }
        arrays[f"node{i}_local"] = _rigid_to_arr(node.local_pose)
        arrays[f"node{i}_global"] = _rigid_to_arr(node.global_pose)
        if node.histogram is not None:
            arrays[f"node{i}_histogram"] = np.asarray(node.histogram)
        if node.gravity_alignment is not None:
            arrays[f"node{i}_gravity"] = np.asarray(node.gravity_alignment)
        entry["has_cloud"] = _cloud_payload(f"node{i}_cloud", node.cloud, arrays)
        entry["has_high"] = _cloud_payload(f"node{i}_high", node.high_cloud, arrays)
        entry["has_low"] = _cloud_payload(f"node{i}_low", node.low_cloud, arrays)
        index["nodes"].append(entry)

    for i, pg_submap in enumerate(pose_graph.submaps):
        submap = pg_submap.submap
        entry = {
            "trajectory_id": pg_submap.trajectory_id,
            "finished": pg_submap.finished,
            "num_range_data": submap.num_range_data,
        }
        arrays[f"submap{i}_local"] = _rigid_to_arr(submap.local_pose)
        arrays[f"submap{i}_global"] = _rigid_to_arr(pg_submap.global_pose)
        if isinstance(submap, Submap3D):
            entry["kind"] = "3d"
            entry["high_meta"] = _grid_payload(f"submap{i}_high", submap.high_resolution_grid, arrays)
            entry["low_meta"] = _grid_payload(f"submap{i}_low", submap.low_resolution_grid, arrays)
            arrays[f"submap{i}_histogram"] = np.asarray(submap.rotational_histogram)
        else:
            entry["kind"] = "2d"
            entry["grid_meta"] = _grid_payload(f"submap{i}_grid", submap.grid, arrays)
        index["submaps"].append(entry)

    for c in pose_graph.constraints:
        index["constraints"].append(
            {
                "submap_index": c.submap_index,
                "node_index": c.node_index,
                "translation_weight": c.translation_weight,
                "rotation_weight": c.rotation_weight,
                "tag": c.tag,
            }
        )
    arrays["constraint_zbars"] = (
        np.stack([_rigid_to_arr(c.zbar) for c in pose_graph.constraints])
        if pose_graph.constraints
        else np.zeros((0, 7))
    )

    arrays["__index__"] = np.frombuffer(json.dumps(index).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(pose_graph, path: str, load_frozen_state: bool = True) -> Dict[int, int]:
    """Load a serialized state into `pose_graph`.

    Returns a trajectory-id remapping {serialized_id: new_id}
    (ref: map_builder.cc LoadState:237-252 trajectory remapping +
    FreezeTrajectory when load_frozen_state).

    Takes the pose graph's host lock (mirroring save_state): loading into
    a live graph must not interleave with the async work queue appending
    nodes/constraints, or the node_offset/submap_offset-based constraint
    indices land on the wrong entries.
    """
    lock = getattr(pose_graph, "_lock", None) or contextlib.nullcontext()
    with lock, np.load(path, allow_pickle=False) as data:
        index = json.loads(bytes(data["__index__"]).decode())
        assert index["magic"] == MAGIC, "not a hectorgrapher_tpu state file"
        version = index["version"]
        assert version <= SERIALIZATION_VERSION, f"unknown version {version}"

        old_ids = sorted(
            {e["trajectory_id"] for e in index["nodes"]}
            | {e["trajectory_id"] for e in index["submaps"]}
        )
        base = max(pose_graph._trajectory_states.keys(), default=-1) + 1
        remap = {old: base + i for i, old in enumerate(old_ids)}

        node_offset = len(pose_graph.nodes)
        submap_offset = len(pose_graph.submaps)

        for i, entry in enumerate(index["nodes"]):
            node = PgNode(
                time=entry["time"],
                local_pose=_rigid_from_arr(data[f"node{i}_local"]),
                global_pose=_rigid_from_arr(data[f"node{i}_global"]),
                trajectory_id=remap[entry["trajectory_id"]],
                cloud=_cloud_from_payload(f"node{i}_cloud", data),
                high_cloud=_cloud_from_payload(f"node{i}_high", data),
                low_cloud=_cloud_from_payload(f"node{i}_low", data),
                histogram=np.asarray(data[f"node{i}_histogram"]) if entry.get("has_histogram") else None,
                gravity_alignment=np.asarray(data[f"node{i}_gravity"]) if f"node{i}_gravity" in data else None,
            )
            node.node_id = pose_graph._next_node_id
            pose_graph._next_node_id += 1
            pose_graph._node_index_by_id[node.node_id] = len(pose_graph.nodes)
            pose_graph.nodes.append(node)

        for i, entry in enumerate(index["submaps"]):
            local_pose = _rigid_from_arr(data[f"submap{i}_local"])
            if entry["kind"] == "3d":
                if f"submap{i}_histogram" in data:
                    histogram = np.asarray(data[f"submap{i}_histogram"])
                else:
                    # Version-1 file: recompute from INTRA-constrained node
                    # histograms, the reference's on-load migration
                    # (ref: map_builder.cc:366-373 +
                    # serialization_format_migration.cc).
                    assert version == 1, f"v{version} 3D submap missing histogram"
                    histogram = None
                    for c in index["constraints"]:
                        if c["tag"] == "INTRA" and c["submap_index"] == i:
                            key = f"node{c['node_index']}_histogram"
                            if key in data:
                                nh = np.asarray(data[key])
                                histogram = nh if histogram is None else histogram + nh
                    if histogram is None:
                        histogram = np.zeros(128, np.float32)
                submap = Submap3D(
                    local_pose=local_pose,
                    high_resolution_grid=_grid_from_payload(f"submap{i}_high", entry["high_meta"], data),
                    low_resolution_grid=_grid_from_payload(f"submap{i}_low", entry["low_meta"], data),
                    rotational_histogram=histogram,
                    num_range_data=entry["num_range_data"],
                    insertion_finished=entry["finished"],
                )
            else:
                submap = Submap2D(
                    local_pose=local_pose,
                    grid=_grid_from_payload(f"submap{i}_grid", entry["grid_meta"], data),
                    num_range_data=entry["num_range_data"],
                    insertion_finished=entry["finished"],
                )
            pg_submap = PgSubmap(
                submap=submap,
                global_pose=_rigid_from_arr(data[f"submap{i}_global"]),
                trajectory_id=remap[entry["trajectory_id"]],
                finished=entry["finished"],
            )
            pg_submap.submap_id = pose_graph._next_submap_id
            pose_graph._next_submap_id += 1
            pose_graph._submap_index_by_id[pg_submap.submap_id] = len(pose_graph.submaps)
            pose_graph.submaps.append(pg_submap)
            pose_graph._submap_ids[id(submap)] = submap_offset + i

        zbars = data["constraint_zbars"]
        for ci, entry in enumerate(index["constraints"]):
            pose_graph.constraints.append(
                Constraint(
                    submap_index=entry["submap_index"] + submap_offset,
                    node_index=entry["node_index"] + node_offset,
                    zbar=_rigid_from_arr(zbars[ci]),
                    translation_weight=entry["translation_weight"],
                    rotation_weight=entry["rotation_weight"],
                    tag=entry["tag"],
                )
            )

        for old, new in remap.items():
            state_name = index["trajectory_states"].get(str(old), "FINISHED")
            if load_frozen_state:
                pose_graph._trajectory_states[new] = TrajectoryState.FROZEN
            else:
                pose_graph._trajectory_states[new] = TrajectoryState[state_name]
    return remap
