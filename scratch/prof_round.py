"""Per-stage profile of the production 2D constraint round (VERDICT r3 #2).

Stages are separated by forced readbacks (_sync) so each wall time is real
device completion, not enqueue. Run on the TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hectorgrapher_tpu.common.config import (
    MapBuilderOptions,
    ProbabilityGridRangeDataInserterOptions2D,
    replace_deep,
)
from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.mapping.grids import make_probability_grid
from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph2D
from hectorgrapher_tpu.mapping.submap_2d import Submap2D
from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1])
            return


def main():
    num_submaps = 32
    grid = make_probability_grid(0.05, (256, 256))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=12.8, resolution=0.05
    )
    pts = raycast_rect_room_2d(np.zeros(2), 0.0, half_width=4.02, half_height=3.41, num_rays=720)
    pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
    cloud = pad_cloud(pts, 512)
    grid = insert(
        grid,
        RangeData(
            origin=jnp.zeros(3, jnp.float32),
            returns=cloud,
            misses=pad_cloud(np.zeros((0, 3), np.float32), 8),
        ),
    )
    options = replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.async_work_queue": False,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.constraint_builder.max_constraint_distance": 100.0,
            "pose_graph.constraint_builder.min_score": 0.5,
        },
    ).pose_graph
    pg = PoseGraph2D(options)

    def mknode(t):
        return PgNode(
            time=t,
            local_pose=NpRigid3(np.zeros(3)),
            global_pose=NpRigid3.identity(),
            cloud=cloud,
        )

    t0 = time.perf_counter()
    for i in range(num_submaps):
        ta = time.perf_counter()
        sm = Submap2D(local_pose=NpRigid3(np.zeros(3)), grid=grid, insertion_finished=True)
        pg.add_node(mknode(0.01 * i), [sm])
        print(f"  add {i}: {time.perf_counter() - ta:.2f}s", flush=True)
    print(f"setup adds: {time.perf_counter() - t0:.2f}s", flush=True)
    active = Submap2D(
        local_pose=NpRigid3(np.zeros(3)),
        grid=make_probability_grid(0.05, (32, 32)),
        insertion_finished=False,
    )
    t0 = time.perf_counter()
    pg.add_node(mknode(1.0), [active])  # warm the full-size round
    print(f"warm round: {time.perf_counter() - t0:.2f}s")

    # Now instrument the batched path manually: monkeypatch timers around
    # the internals by re-running the round with a stage-profiled copy.
    import hectorgrapher_tpu.parallel.constraint_search as cs
    from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
        make_fast_search_config,
    )
    from hectorgrapher_tpu.mapping.scan_matching.gn_2d import match_gn_2d_packed_grids
    from hectorgrapher_tpu.transform.rigid import Rigid2
    from hectorgrapher_tpu.transform import np_quat as nq
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import (
        constraint_search_mesh,
        _pow2,
        _stack_trees,
    )

    node = mknode(2.0)
    with pg._lock:
        node.global_pose = node.local_pose
        pg.nodes.append(node)
        node.node_id = pg._next_node_id
        pg._node_index_by_id[node.node_id] = len(pg.nodes) - 1
        pg._next_node_id += 1

    for rep in range(3):
        stages = {}
        T = time.perf_counter

        t = T()
        pairs = [(node.node_id, s.submap_id) for s in pg.submaps if s.finished]
        gated_local = []
        for nid, sid in pairs:
            g = pg._gate_candidate(nid, sid)
            if g is not None:
                n_, p_, gs = g
                gated_local.append((nid, sid, n_, p_))
        stages["gate"] = T() - t

        cb = pg._options.constraint_builder
        t = T()
        info = getattr(pg, "_grid_info", None) or {}
        pg._grid_info = info
        for _, sid, _, p in gated_local:
            if sid not in info:
                g = p.submap.grid
                from hectorgrapher_tpu.mapping.grids import TSDFGrid

                info[sid] = (float(np.asarray(g.meta.resolution)), isinstance(g, TSDFGrid))
        config = make_fast_search_config(
            cb.fast_correlative_scan_matcher.linear_search_window,
            cb.fast_correlative_scan_matcher.angular_search_window,
            info[gated_local[0][1]][0],
            pg._max_scan_range,
            cb.fast_correlative_scan_matcher.branch_and_bound_depth,
        )
        needed = {}
        for _, sid, _, p in gated_local:
            if sid not in needed:
                pg._submap_matcher(p, config.depth)
                needed[sid] = p
        stages["matcher_cache"] = T() - t

        t = T()
        mesh = constraint_search_mesh()
        slot_by_sid, packed, gn_pack = pg._get_pack_2d(needed, config.depth, mesh)
        stages["pack"] = T() - t

        t = T()
        candidates = []
        for _, sid, n_, p in gated_local:
            init = p.global_pose.inverse().compose(n_.global_pose)
            node_in_grid = p.submap.local_pose.compose(init)
            initial = Rigid2(
                translation=node_in_grid.t[:2].astype(np.float32),
                angle=np.float32(nq.quat_yaw(node_in_grid.q)),
            )
            candidates.append((slot_by_sid[sid], n_.cloud, initial))
        stages["initials"] = T() - t

        # split sharded_fast_matches_2d_packed internals
        t = T()
        n_dev = mesh.devices.size
        _np_cache = {}

        def to_np(x, dtype=None):
            key = id(x)
            got = _np_cache.get(key)
            if got is None:
                got = np.asarray(x, dtype=dtype)
                _np_cache[key] = got
            return got

        npts = to_np(candidates[0][1].positions).shape[0]
        s_per_dev = packed.s_per_dev
        nx, ny = packed.dims
        per_dev = [[] for _ in range(n_dev)]
        for ci, (si, _, _) in enumerate(candidates):
            per_dev[si // s_per_dev].append(ci)
        c_max = cs._pow2_pad(max(1, max(len(lst) for lst in per_dev)))
        c_pad = n_dev * c_max
        clp = np.zeros((c_pad, npts, 3), np.float32)
        clm = np.zeros((c_pad, npts), bool)
        it = np.zeros((c_pad, 2), np.float32)
        ia = np.zeros(c_pad, np.float32)
        cs_arr = np.zeros(c_pad, np.int32)
        cv = np.zeros(c_pad, bool)
        slot_of_candidate = np.full(len(candidates), -1, np.int32)
        for d, lst in enumerate(per_dev):
            for k, ci in enumerate(lst):
                row = d * c_max + k
                si, cloud_, init = candidates[ci]
                clp[row] = to_np(cloud_.positions)
                clm[row] = to_np(cloud_.mask)
                it[row] = to_np(init.translation)
                ia[row] = to_np(init.angle)
                cs_arr[row] = si - d * s_per_dev
                cv[row] = True
                slot_of_candidate[ci] = row
        stages["cand_arrays"] = T() - t

        t = T()
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("graph"))
        batch = cs.CandidateBatch2D(
            cloud_positions=jax.device_put(clp, sharding),
            cloud_mask=jax.device_put(clm, sharding),
            init_translation=jax.device_put(it, sharding),
            init_angle=jax.device_put(ia, sharding),
            submap_slot=jax.device_put(cs_arr, sharding),
            valid=jax.device_put(cv, sharding),
        )
        _sync(batch.cloud_positions)
        stages["upload"] = T() - t

        t = T()
        scores_d, pose_t_d, pose_a_d = cs._sharded_scores_2d(
            packed.levels, packed.min_corners, packed.resolution,
            batch, config, mesh, nx, ny, "graph",
        )
        _sync(scores_d)
        stages["fm_launch"] = T() - t

        t = T()
        scores = np.asarray(scores_d)
        pose_t = np.asarray(pose_t_d)
        pose_a = np.asarray(pose_a_d)
        stages["fm_readback"] = T() - t

        t = T()
        survivors = []
        for ci in range(len(candidates)):
            row = slot_of_candidate[ci]
            if float(scores[row]) >= cb.min_score:
                survivors.append((ci, Rigid2(translation=pose_t[row], angle=pose_a[row])))
        stages["survive"] = T() - t

        t = T()
        pad = _pow2(len(survivors))
        slot_ids = np.zeros(pad, np.int32)
        ptrans = np.zeros((pad, 2), np.float32)
        pang = np.zeros(pad, np.float32)
        for k, (i, pose) in enumerate(survivors):
            slot_ids[k] = slot_by_sid[gated_local[i][1]]
            ptrans[k] = np.asarray(pose.translation)
            pang[k] = np.asarray(pose.angle)
        for k in range(len(survivors), pad):
            slot_ids[k] = slot_ids[0]
            ptrans[k] = ptrans[0]
            pang[k] = pang[0]
        surv_clouds = [gated_local[i][2].cloud for i, _ in survivors]
        clouds = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (pad,) + x.shape), surv_clouds[0]
        )
        poses = Rigid2(translation=ptrans, angle=pang)
        cm = cb.ceres_scan_matcher
        refined, _ = match_gn_2d_packed_grids(
            gn_pack["values"], gn_pack["weights"], gn_pack["min_corners"],
            np.float32(gn_pack["resolution"]), np.float32(gn_pack["pad_value"]),
            slot_ids, clouds, poses, poses.translation,
            cm.occupied_space_weight, cm.translation_weight, cm.rotation_weight,
            is_tsdf=False, num_iterations=cm.ceres_solver_options.max_num_iterations,
        )
        _sync(refined.translation)
        stages["gn_launch"] = T() - t

        t = T()
        rt = np.asarray(refined.translation)
        ra = np.asarray(refined.angle)
        stages["gn_readback"] = T() - t

        total = sum(stages.values())
        print(f"--- rep {rep}: total {total:.3f}s, {len(gated_local)} candidates, {len(survivors)} survivors")
        for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
            print(f"  {k:>14}: {v * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
