"""Mesh-sharded loop-closure constraint search.

The reference fans constraint computation out over a thread pool — one
task per (node, finished submap) candidate
(ref: constraint_builder_2d.cc MaybeAddConstraint/ComputeConstraint,
constraint_builder_3d.cc:162-189). The TPU-native analog: all candidates
of an optimization round are scored in ONE sharded launch — finished
submaps are partitioned across the mesh's `graph` axis (each device holds
only its own submaps' precomputed pyramids), candidates are routed to the
device owning their submap, and every device runs the batched fast
correlative matcher on its block. Results feed the existing sharded SPA
(parallel/sharded.py).

Fixed-extent dense grids make this possible: every submap pyramid has the
same shape, so per-submap state stacks into one array with a leading
submap axis and PartitionSpec('graph') shards it with zero copies once
placed.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hectorgrapher_tpu.mapping.grids import GridMeta
from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
    FastSearchConfig,
    PreparedFastMatcher2D,
    match_fast_2d_prepared,
)
from hectorgrapher_tpu.sensor.types import PointCloud
from hectorgrapher_tpu.transform.rigid import Rigid2


class CandidateBatch2D(NamedTuple):
    """Device-ready candidate arrays (C_pad = n_devices * per_device)."""

    cloud_positions: jax.Array  # (C_pad, N, 3)
    cloud_mask: jax.Array  # (C_pad, N)
    init_translation: jax.Array  # (C_pad, 2)
    init_angle: jax.Array  # (C_pad,)
    submap_slot: jax.Array  # (C_pad,) int32 — LOCAL slot on the owning device
    valid: jax.Array  # (C_pad,) bool


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "nx", "ny", "axis")
)
def _sharded_scores_2d(
    levels: jax.Array,  # (S_pad, depth, F) sharded over submaps
    min_corners: jax.Array,  # (S_pad, 2)
    resolution: jax.Array,  # scalar f32
    batch: CandidateBatch2D,
    config: FastSearchConfig,
    mesh: Mesh,
    nx: int,
    ny: int,
    axis: str = "graph",
):
    dims = jnp.asarray([nx, ny], jnp.int32)

    def device_fn(levels_loc, mc_loc, clp, clm, it, ia, cs, cv):
        def one(clp1, clm1, it1, ia1, s1):
            prepared = PreparedFastMatcher2D(
                flat_levels=levels_loc[s1],
                meta=GridMeta(resolution=resolution, min_corner=mc_loc[s1]),
                dims=dims,
            )
            score, pose = match_fast_2d_prepared(
                prepared, PointCloud(clp1, clm1), Rigid2(it1, ia1), config
            )
            return score, pose.translation, pose.angle

        sc, pt, pa = jax.vmap(one)(clp, clm, it, ia, cs)
        return jnp.where(cv, sc, -jnp.inf), pt, pa

    spec_s = P(axis)
    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(spec_s,) * 8,
        out_specs=(spec_s, spec_s, spec_s),
    )(
        levels,
        min_corners,
        batch.cloud_positions,
        batch.cloud_mask,
        batch.init_translation,
        batch.init_angle,
        batch.submap_slot,
        batch.valid,
    )


def sharded_fast_matches_2d(
    prepared_submaps: Sequence[PreparedFastMatcher2D],
    candidates: Sequence[Tuple[int, PointCloud, Rigid2]],
    config: FastSearchConfig,
    mesh: Mesh,
    axis: str = "graph",
) -> List[Tuple[float, Rigid2]]:
    """Score every (submap_index, cloud, initial_pose) candidate across the
    mesh; returns [(score, pose)] in candidate order.

    Submap i goes to device i * n_dev // S_pad (contiguous blocks); each
    candidate runs on its submap's owner. One launch per round replaces
    the reference's one-task-per-candidate thread-pool dispatch
    (constraint_builder_2d.cc:112-160)."""
    n_dev = mesh.devices.size
    if not candidates:
        return []
    depth, F = np.asarray(prepared_submaps[0].flat_levels).shape
    npts = np.asarray(candidates[0][1].positions).shape[0]
    res = float(np.asarray(prepared_submaps[0].meta.resolution))
    nx, ny = (int(v) for v in np.asarray(prepared_submaps[0].dims))
    for pm in prepared_submaps:
        assert np.asarray(pm.flat_levels).shape == (depth, F), "mixed pyramid shapes"

    s_count = len(prepared_submaps)
    s_pad = ((s_count + n_dev - 1) // n_dev) * n_dev
    s_per_dev = s_pad // n_dev

    levels = np.zeros((s_pad, depth, F), np.float32)
    mcs = np.zeros((s_pad, 2), np.float32)
    for i, pm in enumerate(prepared_submaps):
        levels[i] = np.asarray(pm.flat_levels)
        mcs[i] = np.asarray(pm.meta.min_corner)

    # Route candidates to their submap's owning device.
    per_dev: List[List[int]] = [[] for _ in range(n_dev)]
    for ci, (si, _, _) in enumerate(candidates):
        per_dev[si // s_per_dev].append(ci)
    c_max = max(1, max(len(lst) for lst in per_dev))
    c_pad = n_dev * c_max

    clp = np.zeros((c_pad, npts, 3), np.float32)
    clm = np.zeros((c_pad, npts), bool)
    it = np.zeros((c_pad, 2), np.float32)
    ia = np.zeros(c_pad, np.float32)
    cs = np.zeros(c_pad, np.int32)
    cv = np.zeros(c_pad, bool)
    slot_of_candidate = np.full(len(candidates), -1, np.int32)
    for d, lst in enumerate(per_dev):
        for k, ci in enumerate(lst):
            row = d * c_max + k
            si, cloud, init = candidates[ci]
            clp[row] = np.asarray(cloud.positions)
            clm[row] = np.asarray(cloud.mask)
            it[row] = np.asarray(init.translation)
            ia[row] = float(init.angle)
            cs[row] = si - d * s_per_dev  # local slot on the owner
            cv[row] = True
            slot_of_candidate[ci] = row

    sharding = NamedSharding(mesh, P(axis))
    batch = CandidateBatch2D(
        cloud_positions=jax.device_put(clp, sharding),
        cloud_mask=jax.device_put(clm, sharding),
        init_translation=jax.device_put(it, sharding),
        init_angle=jax.device_put(ia, sharding),
        submap_slot=jax.device_put(cs, sharding),
        valid=jax.device_put(cv, sharding),
    )
    scores, pose_t, pose_a = _sharded_scores_2d(
        jax.device_put(levels, sharding),
        jax.device_put(mcs, sharding),
        jnp.asarray(res, jnp.float32),
        batch,
        config,
        mesh,
        nx,
        ny,
        axis,
    )
    scores = np.asarray(scores)
    pose_t = np.asarray(pose_t)
    pose_a = np.asarray(pose_a)
    out: List[Tuple[float, Rigid2]] = []
    for ci in range(len(candidates)):
        row = slot_of_candidate[ci]
        out.append(
            (
                float(scores[row]),
                Rigid2(
                    translation=jnp.asarray(pose_t[row]),
                    angle=jnp.asarray(pose_a[row]),
                ),
            )
        )
    return out
