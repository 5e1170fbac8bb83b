"""Sparse pose adjustment (SPA) as batched block Gauss-Newton.

TPU-native replacement for OptimizationProblem2D/3D
(ref: internal/optimization/optimization_problem_{2d,3d}.cc — Ceres
problems with SPA residuals per constraint (cost_functions/spa_cost_
function_2d/3d.h), Huber loss on INTER constraints, first submap held
constant, frozen trajectories constant, quaternion parameterization).

Design ("batch, don't queue"): instead of a Ceres sparse solver, the
block structure is exploited directly — per-constraint 12-dim (3D) or
6-dim (2D) Jacobians are computed with a vmapped jacfwd, scattered into
the dense damped normal matrix, and solved with one Cholesky on the MXU.
Dense is right at this scale: D = 6*(S+N) stays in the thousands, and a
single (D,D) factorization is far faster on TPU than sparse iteration.
Huber is applied as IRLS sqrt-weights recomputed each LM iteration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hectorgrapher_tpu.transform.rigid import (
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_axis_angle,
)
from hectorgrapher_tpu.common.math import normalize_angle_difference


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------


class SpaProblem3D(NamedTuple):
    """Static-capacity pose graph arrays (S submaps, N nodes, C constraints)."""

    submap_translation: jax.Array  # (S, 3)
    submap_rotation: jax.Array  # (S, 4)
    node_translation: jax.Array  # (N, 3)
    node_rotation: jax.Array  # (N, 4)
    submap_fixed: jax.Array  # (S,) bool — fixed or invalid
    node_fixed: jax.Array  # (N,) bool
    c_submap: jax.Array  # (C,) int32
    c_node: jax.Array  # (C,) int32
    c_mask: jax.Array  # (C,) bool
    c_rel_translation: jax.Array  # (C, 3) zbar_ij
    c_rel_rotation: jax.Array  # (C, 4)
    c_translation_weight: jax.Array  # (C,)
    c_rotation_weight: jax.Array  # (C,)
    c_huber_scale: jax.Array  # (C,) — large value disables the loss


def _constraint_residual_3d(sub_t, sub_q, node_t, node_q, rel_t, rel_q, wt, wr):
    """(ref: cost_functions/spa_cost_function_3d.h ComputeUnscaledError)"""
    inv_q = quat_conjugate(sub_q)
    h_t = quat_rotate(inv_q, node_t - sub_t)
    h_q = quat_multiply(inv_q, node_q)
    err_q = quat_multiply(quat_conjugate(rel_q), h_q)
    err_t = quat_rotate(quat_conjugate(rel_q), h_t - rel_t)
    return jnp.concatenate([wt * err_t, wr * quat_to_axis_angle(err_q)])


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def solve_spa_3d(problem: SpaProblem3D, num_iterations: int = 20, init_lambda: float = 1e-4):
    """Returns (submap_translation, submap_rotation, node_translation,
    node_rotation, final_cost)."""
    S = problem.submap_translation.shape[0]
    N = problem.node_translation.shape[0]
    D = 6 * (S + N)

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

    def residuals_and_weights(params):
        st, sq, nt, nq = params
        r = jax.vmap(_constraint_residual_3d)(
            st[problem.c_submap],
            sq[problem.c_submap],
            nt[problem.c_node],
            nq[problem.c_node],
            problem.c_rel_translation,
            problem.c_rel_rotation,
            problem.c_translation_weight,
            problem.c_rotation_weight,
        )  # (C, 6)
        r = jnp.where(problem.c_mask[:, None], r, 0.0)
        # Huber IRLS sqrt-weight per constraint block norm.
        norm = jnp.linalg.norm(r, axis=-1)
        scale = problem.c_huber_scale
        w = jnp.where(norm <= scale, 1.0, jnp.sqrt(scale / jnp.maximum(norm, 1e-12)))
        return r, w

    def cost_of(params):
        r, w = residuals_and_weights(params)
        return 0.5 * jnp.sum((r * w[:, None]) ** 2)

    def per_constraint_jac(params, w):
        st, sq, nt, nq = params

        def one(ci):
            si = problem.c_submap[ci]
            ni = problem.c_node[ci]

            def local(d12):
                dsub = d12[:6]
                dnode = d12[6:]
                s_t = st[si] + dsub[:3]
                s_q = quat_normalize(quat_multiply(sq[si], quat_from_axis_angle(dsub[3:])))
                n_t = nt[ni] + dnode[:3]
                n_q = quat_normalize(quat_multiply(nq[ni], quat_from_axis_angle(dnode[3:])))
                return _constraint_residual_3d(
                    s_t, s_q, n_t, n_q,
                    problem.c_rel_translation[ci],
                    problem.c_rel_rotation[ci],
                    problem.c_translation_weight[ci],
                    problem.c_rotation_weight[ci],
                ) * w[ci]

            J = jax.jacfwd(local)(jnp.zeros(12, jnp.float32))  # (6, 12)
            r = local(jnp.zeros(12, jnp.float32))
            return J, r

        return jax.vmap(one)(jnp.arange(problem.c_submap.shape[0]))

    fixed = jnp.concatenate(
        [jnp.repeat(problem.submap_fixed, 6), jnp.repeat(problem.node_fixed, 6)]
    )

    def lm_step(carry, _):
        params, lam = carry
        _, w = residuals_and_weights(params)
        J, r = per_constraint_jac(params, w)  # (C, 6, 12), (C, 6)
        m = problem.c_mask[:, None, None]
        J = jnp.where(m, J, 0.0)
        r = jnp.where(problem.c_mask[:, None], r, 0.0)

        # Tangent indices per constraint: 6 submap dims + 6 node dims.
        sub_base = (problem.c_submap * 6)[:, None] + jnp.arange(6)[None, :]
        node_base = (6 * S + problem.c_node * 6)[:, None] + jnp.arange(6)[None, :]
        idx = jnp.concatenate([sub_base, node_base], axis=1)  # (C, 12)

        JtJ_blocks = jnp.einsum("cri,crj->cij", J, J)  # (C, 12, 12)
        g_blocks = jnp.einsum("cri,cr->ci", J, r)  # (C, 12)

        JtJ = jnp.zeros((D, D), jnp.float32).at[idx[:, :, None], idx[:, None, :]].add(JtJ_blocks)
        g = jnp.zeros((D,), jnp.float32).at[idx].add(g_blocks)

        # Freeze fixed coordinates.
        JtJ = jnp.where(fixed[:, None] | fixed[None, :], 0.0, JtJ)
        g = jnp.where(fixed, 0.0, g)

        diag = jnp.diag(JtJ)
        damped = JtJ + jnp.diag(lam * jnp.maximum(diag, 1e-8) + 1e-8)
        # Unit diagonal for fixed coords keeps the system well-conditioned.
        damped = damped + jnp.diag(fixed.astype(jnp.float32))
        delta = -jnp.linalg.solve(damped, g)
        delta = jnp.where(fixed, 0.0, delta)

        cost = cost_of(params)
        new_params = retract(params, delta)
        new_cost = cost_of(new_params)
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
    (params, _), _ = jax.lax.scan(lm_step, (params0, jnp.asarray(init_lambda, jnp.float32)), None, length=num_iterations)
    return params + (cost_of(params),)


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------


class SpaProblem2D(NamedTuple):
    submap_pose: jax.Array  # (S, 3) x, y, theta
    node_pose: jax.Array  # (N, 3)
    submap_fixed: jax.Array  # (S,)
    node_fixed: jax.Array  # (N,)
    c_submap: jax.Array  # (C,)
    c_node: jax.Array  # (C,)
    c_mask: jax.Array  # (C,)
    c_rel_pose: jax.Array  # (C, 3) zbar_ij
    c_translation_weight: jax.Array  # (C,)
    c_rotation_weight: jax.Array  # (C,)
    c_huber_scale: jax.Array  # (C,)


def _constraint_residual_2d(sub, node, rel, wt, wr):
    """(ref: cost_functions/spa_cost_function_2d.h ComputeUnscaledError)"""
    c, s = jnp.cos(sub[2]), jnp.sin(sub[2])
    d = node[:2] - sub[:2]
    h = jnp.stack([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
    err_t = rel[:2] - h
    err_a = normalize_angle_difference(rel[2] - (node[2] - sub[2]))
    return jnp.concatenate([wt * err_t, (wr * err_a)[None]])


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def solve_spa_2d(problem: SpaProblem2D, num_iterations: int = 20, init_lambda: float = 1e-4):
    S = problem.submap_pose.shape[0]
    N = problem.node_pose.shape[0]
    D = 3 * (S + N)

    def residuals_and_weights(params):
        sp, np_ = params
        r = jax.vmap(_constraint_residual_2d)(
            sp[problem.c_submap],
            np_[problem.c_node],
            problem.c_rel_pose,
            problem.c_translation_weight,
            problem.c_rotation_weight,
        )
        r = jnp.where(problem.c_mask[:, None], r, 0.0)
        norm = jnp.linalg.norm(r, axis=-1)
        scale = problem.c_huber_scale
        w = jnp.where(norm <= scale, 1.0, jnp.sqrt(scale / jnp.maximum(norm, 1e-12)))
        return r, w

    def cost_of(params):
        r, w = residuals_and_weights(params)
        return 0.5 * jnp.sum((r * w[:, None]) ** 2)

    fixed = jnp.concatenate([jnp.repeat(problem.submap_fixed, 3), jnp.repeat(problem.node_fixed, 3)])

    def per_constraint_jac(params, w):
        sp, np_ = params

        def one(ci):
            si = problem.c_submap[ci]
            ni = problem.c_node[ci]

            def local(d6):
                return _constraint_residual_2d(
                    sp[si] + d6[:3],
                    np_[ni] + d6[3:],
                    problem.c_rel_pose[ci],
                    problem.c_translation_weight[ci],
                    problem.c_rotation_weight[ci],
                ) * w[ci]

            return jax.jacfwd(local)(jnp.zeros(6, jnp.float32)), local(jnp.zeros(6, jnp.float32))

        return jax.vmap(one)(jnp.arange(problem.c_submap.shape[0]))

    def lm_step(carry, _):
        params, lam = carry
        _, w = residuals_and_weights(params)
        J, r = per_constraint_jac(params, w)  # (C, 3, 6), (C, 3)
        m = problem.c_mask[:, None, None]
        J = jnp.where(m, J, 0.0)
        r = jnp.where(problem.c_mask[:, None], r, 0.0)

        sub_base = (problem.c_submap * 3)[:, None] + jnp.arange(3)[None, :]
        node_base = (3 * S + problem.c_node * 3)[:, None] + jnp.arange(3)[None, :]
        idx = jnp.concatenate([sub_base, node_base], axis=1)  # (C, 6)

        JtJ_blocks = jnp.einsum("cri,crj->cij", J, J)
        g_blocks = jnp.einsum("cri,cr->ci", J, r)
        JtJ = jnp.zeros((D, D), jnp.float32).at[idx[:, :, None], idx[:, None, :]].add(JtJ_blocks)
        g = jnp.zeros((D,), jnp.float32).at[idx].add(g_blocks)
        JtJ = jnp.where(fixed[:, None] | fixed[None, :], 0.0, JtJ)
        g = jnp.where(fixed, 0.0, g)

        diag = jnp.diag(JtJ)
        damped = JtJ + jnp.diag(lam * jnp.maximum(diag, 1e-8) + 1e-8)
        # Unit diagonal for fixed coords keeps the system well-conditioned.
        damped = damped + jnp.diag(fixed.astype(jnp.float32))
        delta = -jnp.linalg.solve(damped, g)
        delta = jnp.where(fixed, 0.0, delta)

        cost = cost_of(params)
        sp, np_ = params
        new_params = (sp + delta[: 3 * S].reshape(S, 3), np_ + delta[3 * S :].reshape(N, 3))
        new_cost = cost_of(new_params)
        accept = new_cost < cost
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), jnp.minimum(lam * 4.0, 1e8))
        params_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), params, new_params)
        return (params_next, lam_next), new_cost

    params0 = (problem.submap_pose, problem.node_pose)
    (params, _), _ = jax.lax.scan(
        lm_step, (params0, jnp.asarray(init_lambda, jnp.float32)), None, length=num_iterations
    )
    return params + (cost_of(params),)
