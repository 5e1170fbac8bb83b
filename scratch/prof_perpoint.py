import time, functools
import jax, jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import _build_ct_example
from hectorgrapher_tpu.mapping.ct.window_solver import (
    solve_ct_window, CtProblem, make_ct_block_families, per_point_brackets)
from hectorgrapher_tpu.mapping.scan_matching.interpolated_grid import prepare_grid_3d

hi, lo, problem, state, weights = _build_ct_example()
# give per-point times a spread so brackets differ
hi_t = jnp.asarray(np.linspace(-0.09, 0.0, problem.hi_points.shape[1], dtype=np.float32))
problem = problem._replace(
    hi_times=jnp.broadcast_to(hi_t, problem.hi_times.shape),
    lo_times=jnp.broadcast_to(hi_t[: problem.lo_times.shape[1]], problem.lo_times.shape),
)

def timeit(f, n=20, w=3):
    for _ in range(w): jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(f()); ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]

for pp in (False, True):
    f = functools.partial(solve_ct_window, hi, lo, problem, state, weights,
                          is_tsdf=True, num_iterations=8, per_point=pp)
    m = timeit(f)
    print(f"per_point={pp}: {m*1e3:.3f} ms ({1/m:.0f}/s)")

# Stage isolation: assemble-only for per-point
ph = prepare_grid_3d(hi); pl = prepare_grid_3d(lo)
jax.block_until_ready((ph, pl))
blk, pair = make_ct_block_families(ph, pl, problem, weights, True, per_point=True)
jit_blk = jax.jit(blk)
m = timeit(lambda: jit_blk(state))
print(f"point_scan_block (one eval): {m*1e3:.3f} ms")
blk2, _ = make_ct_block_families(ph, pl, problem, weights, True, per_point=False)
jit_blk2 = jax.jit(blk2)
m = timeit(lambda: jit_blk2(state))
print(f"scan_block (one eval):       {m*1e3:.3f} ms")
m = timeit(jax.jit(lambda: prepare_grid_3d(hi)))
print(f"prepare_grid_3d(hi):         {m*1e3:.3f} ms")
