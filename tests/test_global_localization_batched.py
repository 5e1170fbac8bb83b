"""Batched GLOBAL (full-submap) localization on the production path
(VERDICT r3 #7): first localization against a loaded reference-format
map fires its full-submap candidates through ONE batched launch — the
serial per-candidate loop is gone.

(ref: fast_correlative_scan_matcher_3d.cc MatchFullSubmap:177-201 +
pose_graph_3d.cc:188-192 — the global localization sampler dispatches
full-submap searches; here a disconnected trajectory's first node
searches every frozen submap in one sharded launch.)"""

import numpy as np
import pytest

import hectorgrapher_tpu.mapping.pose_graph.pose_graph as pg_mod
from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
from hectorgrapher_tpu.io.pbstream_state import load_pbstream_state, write_pbstream_state
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph2D
from hectorgrapher_tpu.transform.np_quat import NpRigid3
from tests.test_batched_constraint_path import (
    build_finished_submap_2d,
    node_2d,
    active_submap_2d,
)


def _options(batched: bool):
    return replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.use_batched_constraint_search": batched,
            # Disconnected trajectories go straight to GLOBAL (full-submap)
            # searches; sample every candidate.
            "pose_graph.use_global_constraint_search": True,
            "pose_graph.global_constraint_search_after_n_seconds": 0.0,
            "pose_graph.global_sampling_ratio": 1.0,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.45,
            "pose_graph.constraint_builder.global_localization_min_score": 0.45,
            "pose_graph.constraint_builder.max_constraint_distance": 10.0,
        },
    ).pose_graph


@pytest.fixture(scope="module")
def frozen_map(tmp_path_factory):
    """A 2-submap map written in the REFERENCE pbstream format."""
    pg = PoseGraph2D(_options(batched=True))
    a1 = build_finished_submap_2d([np.zeros(3), np.array([0.4, 0.3, 0.0])])
    a2 = build_finished_submap_2d([np.array([0.3, -0.3, 0.0]), np.array([0.7, 0.0, 0.0])])
    pg.add_node(node_2d(0.0, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), [a1])
    pg.add_node(node_2d(0.1, [0.4, 0.3, 0.0], [0.4, 0.3, 0.0]), [a2])
    path = str(tmp_path_factory.mktemp("map") / "map.pbstream")
    write_pbstream_state(pg, path)
    return path


def _localize(frozen_map, batched, monkeypatch):
    pg = PoseGraph2D(_options(batched))
    remap = load_pbstream_state(pg, frozen_map, load_frozen_state=True)
    frozen_id = list(remap.values())[0]
    assert pg.is_frozen(frozen_id)
    assert sum(1 for s in pg.submaps if s.finished) == 2

    batched_global = []
    orig = PoseGraph2D._compute_constraints_batched

    def spy(self, gated, global_search=False):
        if global_search:
            batched_global.append(len(gated))
        return orig(self, gated, global_search=global_search)

    monkeypatch.setattr(PoseGraph2D, "_compute_constraints_batched", spy)

    # A DISCONNECTED trajectory's first node (0.35 m true offset with
    # 0.3 m initial error): never connected to the frozen trajectory, so
    # every frozen submap is a full-submap global candidate.
    truth = np.array([0.3, -0.2, 0.0])
    drift = np.array([0.3, 0.0, 0.0])
    node = node_2d(5.0, truth + drift, truth)
    node.trajectory_id = frozen_id + 1
    pg.register_trajectory(node.trajectory_id)
    pg.add_node(node, [active_submap_2d()])
    pg.wait_for_all_computations()
    inter = [
        c for c in pg.constraints
        if c.tag == "INTER" and pg.submaps[c.submap_index].trajectory_id == frozen_id
    ]
    return pg, inter, batched_global


def test_first_fix_is_one_batched_launch(frozen_map, monkeypatch):
    pg, inter, batched_global = _localize(frozen_map, batched=True, monkeypatch=monkeypatch)
    assert batched_global and max(batched_global) == 2, (
        "global candidates did not go through one batched launch",
        batched_global,
    )
    assert len(inter) >= 1, "no localization constraints against the frozen map"
    pg.run_final_optimization()
    truth = np.array([0.3, -0.2, 0.0])
    err = np.linalg.norm(pg.nodes[-1].global_pose.t - truth)
    assert err < 0.12, f"global localization failed: {err:.3f} m"


def test_batched_global_matches_serial(frozen_map, monkeypatch):
    _, inter_b, batched_global = _localize(frozen_map, batched=True, monkeypatch=monkeypatch)
    assert batched_global
    _, inter_s, _ = _localize(frozen_map, batched=False, monkeypatch=monkeypatch)
    key = lambda cs: sorted((c.submap_index, tuple(np.round(c.zbar.t, 4))) for c in cs)
    assert key(inter_b) == key(inter_s)


def test_alternating_local_and_global_rounds_do_not_thrash_packs(frozen_map, monkeypatch):
    """Local-window and full-submap rounds use different pyramid depths;
    the per-depth pack caches must satisfy BOTH without rebuilding on
    every alternation (each depth's pack builds at most twice: once per
    new-submap set it sees)."""
    import hectorgrapher_tpu.parallel.constraint_search as cs

    builds = []
    orig_pack = cs.pack_submaps_2d_from_arrays

    def spy(host_arrays, res, dims, mesh, axis="graph"):
        builds.append(len(host_arrays))
        return orig_pack(host_arrays, res, dims, mesh, axis)

    monkeypatch.setattr(cs, "pack_submaps_2d_from_arrays", spy)

    pg = PoseGraph2D(_options(batched=True))
    remap = load_pbstream_state(pg, frozen_map, load_frozen_state=True)
    frozen_id = list(remap.values())[0]
    truth = np.array([0.3, -0.2, 0.0])

    # Disconnected trajectory -> GLOBAL rounds; same trajectory as the
    # frozen map -> LOCAL rounds. Alternate three times each.
    for k in range(3):
        g = node_2d(10.0 + k, truth, truth)
        g.trajectory_id = frozen_id + 1
        pg.register_trajectory(g.trajectory_id)
        pg.add_node(g, [active_submap_2d()])
        l = node_2d(20.0 + k, truth, truth)
        l.trajectory_id = frozen_id + 1  # now CONNECTED (global round linked it)
        pg.add_node(l, [active_submap_2d()])
    pg.wait_for_all_computations()
    # One build per depth when first needed; alternation must not add more.
    assert len(builds) <= 2, f"pack rebuilt {len(builds)} times: {builds}"
