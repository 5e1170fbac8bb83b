"""Pose graph trimmers.

(ref: cartographer/mapping/pose_graph_trimmer.{h,cc} — Trimmable mutation
API + PureLocalizationTrimmer (keep last N submaps, pose_graph_trimmer.h:
69-75); internal/2d/overlapping_submaps_trimmer_2d.{h,cc} — trim submaps
whose coverage is dominated by fresher ones.)
"""

from __future__ import annotations

from typing import List, Set

import numpy as np


def trim_submaps(pose_graph, submap_indices: Set[int]) -> None:
    """Remove submaps (and constraints touching them; then nodes that lost
    every constraint), remapping indices — the Trimmable API's effect
    (ref: pose_graph_trimmer.h Trimmable::TrimSubmap)."""
    if not submap_indices:
        return
    keep_submaps = [i for i in range(len(pose_graph.submaps)) if i not in submap_indices]
    submap_remap = {old: new for new, old in enumerate(keep_submaps)}

    pose_graph.constraints = [
        c for c in pose_graph.constraints if c.submap_index not in submap_indices
    ]
    nodes_with_constraints = {c.node_index for c in pose_graph.constraints}
    keep_nodes = [
        i for i in range(len(pose_graph.nodes)) if i in nodes_with_constraints
    ]
    node_remap = {old: new for new, old in enumerate(keep_nodes)}

    for c in pose_graph.constraints:
        c.submap_index = submap_remap[c.submap_index]
        c.node_index = node_remap[c.node_index]
    removed_submaps = [pose_graph.submaps[i] for i in submap_indices]
    pose_graph.submaps = [pose_graph.submaps[i] for i in keep_submaps]
    pose_graph.nodes = [pose_graph.nodes[i] for i in keep_nodes]
    for s in removed_submaps:
        pose_graph._submap_ids.pop(id(s.submap), None)
    for new_i, s in enumerate(pose_graph.submaps):
        pose_graph._submap_ids[id(s.submap)] = new_i
    # Rebuild the stable-id -> index maps; async work items queued before
    # this trim resolve through them (or find their entry gone and drop).
    pose_graph._node_index_by_id = {n.node_id: i for i, n in enumerate(pose_graph.nodes)}
    pose_graph._submap_index_by_id = {
        s.submap_id: i for i, s in enumerate(pose_graph.submaps)
    }
    # Per-submap matcher caches are keyed by stable submap_id: entries for
    # surviving submaps stay valid; drop only the trimmed ones.
    cache = getattr(pose_graph, "_matcher_cache", None)
    if cache is not None:
        for s in removed_submaps:
            cache.pop(s.submap_id, None)
    # Device-resident constraint-search packs: a pack whose order contains
    # a trimmed submap is dropped so the next round rebuilds without it
    # (trimmed state must not count against the HBM budget); surviving
    # submaps' host arrays stay cached, so the rebuild is upload-only.
    removed_sids = {s.submap_id for s in removed_submaps}
    pack3d = getattr(pose_graph, "_pack3d", None)
    if pack3d is not None and removed_sids & set(pack3d["slots"]):
        for sid in removed_sids:
            pack3d["host"].pop(sid, None)
        pose_graph._pack3d = None
    shipped3d = getattr(pose_graph, "_shipped_pack3d", None)
    if shipped3d:
        shipped3d -= removed_sids
    used3d = getattr(pose_graph, "_pack3d_used", None)
    if used3d:
        for sid in removed_sids:
            used3d.pop(sid, None)
    packs2d = getattr(pose_graph, "_packs2d", None)
    if packs2d is not None:
        for depth in list(packs2d):
            if removed_sids & set(packs2d[depth]["slots"]):
                del packs2d[depth]
    shipped2d = getattr(pose_graph, "_shipped_pack2d", None)
    if shipped2d:
        shipped2d -= {
            (sid, depth) for (sid, depth) in shipped2d if sid in removed_sids
        }
    used2d = getattr(pose_graph, "_pack2d_used", None)
    if used2d:
        for sid in removed_sids:
            used2d.pop(sid, None)


class PureLocalizationTrimmer:
    """Keep only the last max_submaps_to_keep submaps of a trajectory
    (ref: pose_graph_trimmer.h:69-75 PureLocalizationTrimmer)."""

    def __init__(self, trajectory_id: int, max_submaps_to_keep: int):
        assert max_submaps_to_keep >= 2
        self.trajectory_id = trajectory_id
        self.max_submaps_to_keep = max_submaps_to_keep
        self._finished = False

    def trim(self, pose_graph) -> None:
        if self._finished:
            return
        own = [
            i
            for i, s in enumerate(pose_graph.submaps)
            if s.trajectory_id == self.trajectory_id
        ]
        excess = len(own) - self.max_submaps_to_keep
        if excess > 0:
            trim_submaps(pose_graph, set(own[:excess]))

    def is_finished(self) -> bool:
        return self._finished


class OverlappingSubmapsTrimmer2D:
    """(ref: internal/2d/overlapping_submaps_trimmer_2d.cc — compute per
    low-res cell the freshest covering submap; trim old submaps whose
    uniquely-covered area falls below min_covered_area.)"""

    def __init__(self, fresh_submaps_count: int, min_covered_area: float, min_added_submaps_count: int):
        self.fresh_submaps_count = fresh_submaps_count
        self.min_covered_area = min_covered_area
        self.min_added_submaps_count = min_added_submaps_count
        self._current_submap_count = 0

    def trim(self, pose_graph, coverage_resolution: float = 0.5) -> None:
        finished = [
            (i, s) for i, s in enumerate(pose_graph.submaps) if s.finished
        ]
        if len(finished) <= self.fresh_submaps_count:
            return
        if len(pose_graph.submaps) - self._current_submap_count < self.min_added_submaps_count:
            return
        # Freshest-coverage map over coarse cells (global frame).
        coverage = {}
        for order, (i, pg_submap) in enumerate(finished):
            cells = self._covered_cells(pg_submap, coverage_resolution)
            for c in cells:
                prev = coverage.get(c)
                if prev is None or order > prev:
                    coverage[c] = order
        to_trim = set()
        for order, (i, pg_submap) in enumerate(finished[: -self.fresh_submaps_count]):
            cells = self._covered_cells(pg_submap, coverage_resolution)
            unique = sum(1 for c in cells if coverage.get(c) == order)
            if unique * coverage_resolution**2 < self.min_covered_area:
                to_trim.add(i)
        if to_trim:
            trim_submaps(pose_graph, to_trim)
            self._current_submap_count = len(pose_graph.submaps)

    @staticmethod
    def _covered_cells(pg_submap, resolution: float):
        grid = pg_submap.submap.grid
        known = np.asarray(grid.known)
        if not known.any():
            return set()
        idx = np.argwhere(known)
        min_corner = np.asarray(grid.meta.min_corner)
        res = float(grid.meta.resolution)
        world = min_corner[None, :] + (idx + 0.5) * res
        # Shift into global frame via the submap's global pose correction.
        delta = pg_submap.global_pose.t[:2] - pg_submap.submap.local_pose.t[:2]
        world = world + delta[None, :]
        cells = np.floor(world / resolution).astype(np.int64)
        return {(int(a), int(b)) for a, b in cells}
