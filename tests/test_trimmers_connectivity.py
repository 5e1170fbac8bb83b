"""Trimmer + connectivity tests
(ref: connected_components_test.cc, trajectory_connectivity_state
behavior, pose_graph trimmer usage)."""

import numpy as np

from hectorgrapher_tpu.common.config import PoseGraphOptions
from hectorgrapher_tpu.mapping.grids import make_probability_grid
from hectorgrapher_tpu.mapping.pose_graph.connectivity import (
    ConnectedComponents,
    TrajectoryConnectivityState,
)
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
    Constraint,
    PgNode,
    PgSubmap,
    PoseGraph2D,
)
from hectorgrapher_tpu.mapping.pose_graph.trimmers import (
    PureLocalizationTrimmer,
    trim_submaps,
)
from hectorgrapher_tpu.mapping.submap_2d import Submap2D
from hectorgrapher_tpu.transform.np_quat import NpRigid3


class TestConnectedComponents:
    def test_union_find(self):
        cc = ConnectedComponents()
        cc.connect(0, 1)
        cc.connect(2, 3)
        assert cc.transitively_connected(0, 1)
        assert not cc.transitively_connected(0, 2)
        cc.connect(1, 2)
        assert cc.transitively_connected(0, 3)
        comps = cc.connected_components()
        assert sorted(map(len, comps)) == [4]

    def test_self_connected(self):
        cc = ConnectedComponents()
        assert cc.transitively_connected(5, 5)

    def test_connectivity_state_times(self):
        s = TrajectoryConnectivityState()
        s.connect(0, 1, 10.0)
        s.connect(0, 1, 20.0)
        assert s.last_connection_time(0, 1) == 20.0
        assert s.transitively_connected(0, 1)


def build_graph(num_submaps=5, nodes_per=2):
    pg = PoseGraph2D(PoseGraphOptions())
    for si in range(num_submaps):
        submap = Submap2D(
            local_pose=NpRigid3(np.array([si * 1.0, 0, 0])),
            grid=make_probability_grid(0.05, (32, 32)),
            insertion_finished=True,
        )
        pg.submaps.append(
            PgSubmap(
                submap=submap,
                global_pose=NpRigid3(np.array([si * 1.0, 0, 0])),
                finished=True,
                submap_id=si,
            )
        )
        pg._submap_ids[id(submap)] = si
        pg._submap_index_by_id[si] = si
        pg._next_submap_id = si + 1
        for k in range(nodes_per):
            ni = len(pg.nodes)
            pg.nodes.append(
                PgNode(
                    time=float(ni),
                    local_pose=NpRigid3(np.array([si + 0.5 * k, 0, 0])),
                    global_pose=NpRigid3(np.array([si + 0.5 * k, 0, 0])),
                    node_id=ni,
                )
            )
            pg._node_index_by_id[ni] = ni
            pg._next_node_id = ni + 1
            pg.constraints.append(
                Constraint(si, ni, NpRigid3(), 1.0, 1.0, "INTRA")
            )
    return pg


class TestTrimmers:
    def test_trim_submaps_remaps_indices(self):
        pg = build_graph()
        n_nodes = len(pg.nodes)
        trim_submaps(pg, {0, 1})
        assert len(pg.submaps) == 3
        assert len(pg.nodes) == n_nodes - 4  # orphaned nodes removed
        for c in pg.constraints:
            assert 0 <= c.submap_index < 3
            assert 0 <= c.node_index < len(pg.nodes)

    def test_pure_localization_trimmer(self):
        pg = build_graph(num_submaps=6)
        trimmer = PureLocalizationTrimmer(trajectory_id=0, max_submaps_to_keep=3)
        trimmer.trim(pg)
        assert len(pg.submaps) == 3
        # The kept submaps are the newest ones.
        xs = [s.submap.local_pose.t[0] for s in pg.submaps]
        assert xs == sorted(xs) and xs[0] == 3.0


class TestMatcherCacheInvalidation:
    def test_trim_drops_trimmed_submap_matcher_cache(self):
        # Caches are keyed by stable submap_id: trimmed entries are
        # dropped, surviving entries stay valid (no index remap applies).
        pg = build_graph()
        pg._matcher_cache[0] = ("sentinel0",)
        pg._matcher_cache[2] = ("sentinel2",)
        trim_submaps(pg, {0})
        assert 0 not in pg._matcher_cache
        assert pg._matcher_cache[2] == ("sentinel2",)

    def test_trim_rebuilds_stable_id_maps(self):
        # Async work items resolve through the stable-id maps; after a trim
        # they must point at the surviving entries' new positions.
        pg = build_graph()
        trim_submaps(pg, {0, 1})
        for sid, idx in pg._submap_index_by_id.items():
            assert pg.submaps[idx].submap_id == sid
        for nid, idx in pg._node_index_by_id.items():
            assert pg.nodes[idx].node_id == nid
        assert 0 not in pg._submap_index_by_id and 1 not in pg._submap_index_by_id
