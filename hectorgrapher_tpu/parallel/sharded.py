"""Multi-device sharding of the pose-graph workloads.

TPU-native replacement for the reference's distributed mapping layer
(ref: cartographer/cloud — gRPC uplink server holding the global pose
graph; SURVEY.md section 2.12 #3): instead of RPC between processes, the
pose-graph state is sharded over a jax.sharding.Mesh and reductions ride
the ICI collectives.

Implemented here:
  * solve_spa_2d_sharded / solve_spa_3d_sharded — distributed block
    Gauss-Newton: constraints are sharded across the mesh's "graph" axis,
    each device assembles its partial BLOCK normal-equation operands
    (block-diagonal submap/node blocks + the submap-node coupling blocks),
    a psum reduces them, and every device runs the same Schur-complement
    solve as the local solver. Communication per iteration = the block
    operands (~(S*N+S+N)*P^2 floats), ~10x less than psumming the dense
    (D, D) normal matrix.

Single-chip training still works: with a 1-device mesh these reduce to
the local solvers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hectorgrapher_tpu.mapping.pose_graph.optimization import (
    SpaProblem2D,
    SpaProblem3D,
    _constraint_residual_2d,
    _constraint_residual_3d,
    _lm_drive,
    _spa_partial_blocks,
    _spa_schur_solve,
)
from hectorgrapher_tpu.transform.rigid import (
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
)


def _pad_constraints(problem, axis_size: int):
    """Pad the constraint axis to a multiple of the mesh axis size."""
    c = problem.c_submap.shape[0]
    target = ((c + axis_size - 1) // axis_size) * axis_size
    if target == c:
        return problem
    pad = target - c

    def pad_leaf(name, x):
        if not name.startswith("c_"):
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return type(problem)(**{k: pad_leaf(k, v) for k, v in problem._asdict().items()})


@functools.partial(jax.jit, static_argnames=("mesh", "num_iterations"))
def solve_spa_2d_sharded(problem: SpaProblem2D, mesh: Mesh, num_iterations: int = 20):
    """Distributed 2D SPA over mesh axis "graph"."""
    axis = mesh.axis_names[0]
    problem = _pad_constraints(problem, mesh.shape[axis])
    S = problem.submap_pose.shape[0]
    N = problem.node_pose.shape[0]

    c_spec = P(axis)
    rep = P()

    def assemble(sp, np_, c_submap, c_node, c_mask, c_rel, c_wt, c_wr, c_hub):
        """Partial block operands + cost for this device's constraint shard."""

        def one(ci):
            si = c_submap[ci]
            ni = c_node[ci]

            def local(d6):
                return _constraint_residual_2d(
                    sp[si] + d6[:3], np_[ni] + d6[3:], c_rel[ci], c_wt[ci], c_wr[ci]
                )

            r0 = local(jnp.zeros(6, jnp.float32))
            norm = jnp.linalg.norm(r0)
            w = jnp.where(norm <= c_hub[ci], 1.0, jnp.sqrt(c_hub[ci] / jnp.maximum(norm, 1e-12)))
            J = jax.jacfwd(local)(jnp.zeros(6, jnp.float32)) * w
            r = r0 * w
            m = c_mask[ci]
            return jnp.where(m, J, 0.0), jnp.where(m, r, 0.0)

        J, r = jax.vmap(one)(jnp.arange(c_submap.shape[0]))
        blocks = _spa_partial_blocks(J[:, :, :3], J[:, :, 3:], r, c_submap, c_node, S, N)
        cost = 0.5 * jnp.sum(r * r)
        # ICI reduction: every device gets the global block operands.
        return jax.lax.psum((blocks, cost), axis)

    assemble_sharded = jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, c_spec, c_spec, c_spec, c_spec, c_spec, c_spec, c_spec),
        out_specs=(rep, rep),
    )

    def cost_and_blocks(params):
        sp, np_ = params
        return assemble_sharded(
            sp,
            np_,
            problem.c_submap,
            problem.c_node,
            problem.c_mask,
            problem.c_rel_pose,
            problem.c_translation_weight,
            problem.c_rotation_weight,
            problem.c_huber_scale,
        )

    def retract(params, delta):
        sp, np_ = params
        return (sp + delta[: 3 * S].reshape(S, 3), np_ + delta[3 * S :].reshape(N, 3))

    params0 = (problem.submap_pose, problem.node_pose)
    # Carried-evaluation LM with Ceres-style termination; one psum'd block
    # assembly per iteration (the cond consumes replicated scalars, so the
    # while_loop composes with the shard_map collectives).
    params, final_cost = _lm_drive(
        cost_and_blocks,
        lambda blocks, lam: _spa_schur_solve(
            blocks, problem.submap_fixed, problem.node_fixed, lam
        ),
        retract,
        params0,
        num_iterations,
        1e-4,
    )
    return params[0], params[1], final_cost


@functools.partial(jax.jit, static_argnames=("mesh", "num_iterations"))
def solve_spa_3d_sharded(problem: SpaProblem3D, mesh: Mesh, num_iterations: int = 20):
    """Distributed 3D SPA over mesh axis "graph" (same structure as 2D)."""
    axis = mesh.axis_names[0]
    problem = _pad_constraints(problem, mesh.shape[axis])
    S = problem.submap_translation.shape[0]
    N = problem.node_translation.shape[0]

    c_spec = P(axis)
    rep = P()

    def assemble(st, sq, nt, nq, c_submap, c_node, c_mask, c_rt, c_rq, c_wt, c_wr, c_hub):
        def one(ci):
            si = c_submap[ci]
            ni = c_node[ci]

            def local(d12):
                s_t = st[si] + d12[:3]
                s_q = quat_normalize(quat_multiply(sq[si], quat_from_axis_angle(d12[3:6])))
                n_t = nt[ni] + d12[6:9]
                n_q = quat_normalize(quat_multiply(nq[ni], quat_from_axis_angle(d12[9:12])))
                return _constraint_residual_3d(
                    s_t, s_q, n_t, n_q, c_rt[ci], c_rq[ci], c_wt[ci], c_wr[ci]
                )

            r0 = local(jnp.zeros(12, jnp.float32))
            norm = jnp.linalg.norm(r0)
            w = jnp.where(norm <= c_hub[ci], 1.0, jnp.sqrt(c_hub[ci] / jnp.maximum(norm, 1e-12)))
            J = jax.jacfwd(local)(jnp.zeros(12, jnp.float32)) * w
            m = c_mask[ci]
            return jnp.where(m, J, 0.0), jnp.where(m, r0 * w, 0.0)

        J, r = jax.vmap(one)(jnp.arange(c_submap.shape[0]))
        blocks = _spa_partial_blocks(J[:, :, :6], J[:, :, 6:], r, c_submap, c_node, S, N)
        cost = 0.5 * jnp.sum(r * r)
        return jax.lax.psum((blocks, cost), axis)

    assemble_sharded = jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep) + (c_spec,) * 8,
        out_specs=(rep, rep),
    )

    def cost_and_blocks(params):
        st, sq, nt, nq = params
        return assemble_sharded(
            st, sq, nt, nq,
            problem.c_submap, problem.c_node, problem.c_mask,
            problem.c_rel_translation, problem.c_rel_rotation,
            problem.c_translation_weight, problem.c_rotation_weight,
            problem.c_huber_scale,
        )

    def retract(params, delta):
        st, sq, nt, nq = params
        ds = delta[: 6 * S].reshape(S, 6)
        dn = delta[6 * S :].reshape(N, 6)
        return (
            st + ds[:, :3],
            quat_normalize(quat_multiply(sq, quat_from_axis_angle(ds[:, 3:]))),
            nt + dn[:, :3],
            quat_normalize(quat_multiply(nq, quat_from_axis_angle(dn[:, 3:]))),
        )

    params0 = (
        problem.submap_translation,
        problem.submap_rotation,
        problem.node_translation,
        problem.node_rotation,
    )
    params, final_cost = _lm_drive(
        cost_and_blocks,
        lambda blocks, lam: _spa_schur_solve(
            blocks, problem.submap_fixed, problem.node_fixed, lam
        ),
        retract,
        params0,
        num_iterations,
        1e-4,
    )
    return params + (final_cost,)
