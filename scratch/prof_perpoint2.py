"""Decompose the per-point CT window solve (honest slope timing):
full solve vs per-scan, plus isolated pieces of the per-point residual
(pose jacfwd, row gathers) at the same shapes."""
import sys, time, functools

sys.path.insert(0, "/root/repo")

import numpy as np, jax, jax.numpy as jnp

from __graft_entry__ import _build_ct_example
from hectorgrapher_tpu.mapping.ct import window_solver as ws


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1]); return


def chain_time(fn, iters=16, repeats=3):
    def run(n):
        t0 = time.perf_counter(); out = None
        for _ in range(n): out = fn()
        _sync(out); return time.perf_counter() - t0
    run(1)
    slopes = []
    for _ in range(repeats):
        t1 = run(1); tn = run(iters)
        slopes.append(max(tn - t1, 1e-9) / (iters - 1))
    return float(np.median(slopes))


hi, lo, problem, state, weights = _build_ct_example()

pp = jax.jit(functools.partial(ws.solve_ct_window, is_tsdf=True, num_iterations=8, per_point=True))
ps = jax.jit(functools.partial(ws.solve_ct_window, is_tsdf=True, num_iterations=8, per_point=False))
_sync(pp(hi, lo, problem, state, weights)); _sync(ps(hi, lo, problem, state, weights))
t_pp = chain_time(lambda: pp(hi, lo, problem, state, weights))
t_ps = chain_time(lambda: ps(hi, lo, problem, state, weights))
print(f"per_point solve: {t_pp*1e3:.3f} ms   per_scan: {t_ps*1e3:.3f} ms   ratio {t_pp/t_ps:.2f}", flush=True)

# Isolate: the vmapped pose jacfwd at per-point shapes (N = C*P*2 grids)
C, P = problem.hi_points.shape[0], problem.hi_points.shape[1]
N = C * P
rng = np.random.default_rng(0)
prv = jnp.asarray(rng.integers(0, 7, N).astype(np.int32))
f = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))


@jax.jit
def pose_jacfwd(state):
    args = (
        state.translation[prv], state.rotation[prv], state.velocity[prv],
        state.translation[prv + 1], state.rotation[prv + 1], state.velocity[prv + 1],
        f,
    )
    z = jnp.zeros(18, jnp.float32)
    pose7 = jax.vmap(ws._pose_of_interp, in_axes=(0,) * 7 + (None,))(*args, z) if hasattr(ws, "_pose_of_interp") else None
    return args[0]


# _pose_of is a closure inside the builder; re-create it here
from hectorgrapher_tpu.mapping.ct.window_solver import _retract_one
from hectorgrapher_tpu.transform.rigid import quat_normalize, quat_slerp


def _pose_of(tp, qp, vp, tn, qn, vn, ff, d18):
    t0, q0, _ = _retract_one(tp, qp, vp, d18[:9])
    t1, q1, _ = _retract_one(tn, qn, vn, d18[9:])
    return jnp.concatenate([t0 + ff * (t1 - t0), quat_normalize(quat_slerp(q0, q1, ff))])


@jax.jit
def jac_only(state):
    args = (
        state.translation[prv], state.rotation[prv], state.velocity[prv],
        state.translation[prv + 1], state.rotation[prv + 1], state.velocity[prv + 1],
        f,
    )
    z = jnp.zeros(18, jnp.float32)
    d = jax.vmap(jax.jacfwd(_pose_of, argnums=7), in_axes=(0,) * 7 + (None,))(*args, z)
    return jnp.sum(d)


@jax.jit
def pose_only(state):
    args = (
        state.translation[prv], state.rotation[prv], state.velocity[prv],
        state.translation[prv + 1], state.rotation[prv + 1], state.velocity[prv + 1],
        f,
    )
    z = jnp.zeros(18, jnp.float32)
    p7 = jax.vmap(_pose_of, in_axes=(0,) * 7 + (None,))(*args, z)
    return jnp.sum(p7)


_sync(jac_only(state)); _sync(pose_only(state))
tj = chain_time(lambda: jac_only(state))
tp = chain_time(lambda: pose_only(state))
print(f"pose jacfwd (N={N}): {tj*1e3:.3f} ms   pose only: {tp*1e3:.3f} ms", flush=True)
print(f"note: per LM iteration the solve evaluates residual+jacobian once and a trial cost once", flush=True)
