"""Per-point CT solve stage profile (honest chained-dispatch slope).

Separates the per-point solve's cost into: block build (point_scan_block),
LM iteration cost (slope over num_iterations), and fixed overhead, to find
the dominator of the 2.0 ms (vs 0.66 ms per-scan) solve.
"""

import functools

import jax

from bench import _chain_time, _sync
from __graft_entry__ import _build_ct_example
from hectorgrapher_tpu.mapping.ct.window_solver import (
    solve_ct_window,
    make_ct_block_families,
    prepare_grid_3d,
)


def main():
    hi, lo, problem, state, weights = _build_ct_example()

    results = {}
    for iters in (1, 2, 8):
        for pp in (True, False):
            step = jax.jit(
                functools.partial(
                    solve_ct_window, is_tsdf=True, num_iterations=iters, per_point=pp
                )
            )
            _sync(step(hi, lo, problem, state, weights))
            med, _ = _chain_time(
                lambda: step(hi, lo, problem, state, weights), iters=16, repeats=3
            )
            results[(iters, pp)] = med
            print(f"iters={iters} per_point={pp}: {med*1e3:.3f} ms", flush=True)

    # Block-build alone (one evaluation of the scan family + assembly-free)
    @functools.partial(jax.jit, static_argnames=("pp",))
    def build_only(hi, lo, problem, state, weights, pp):
        ph = prepare_grid_3d(hi)
        pl = prepare_grid_3d(lo)
        scan_block, pair_block = make_ct_block_families(
            ph, pl, problem, weights, True, per_point=pp
        )
        fam = scan_block(state)
        return fam[0]

    for pp in (True, False):
        f = functools.partial(build_only, hi, lo, problem, state, weights, pp=pp)
        _sync(f())
        med, _ = _chain_time(f, iters=16, repeats=3)
        print(f"scan_block eval per_point={pp}: {med*1e3:.3f} ms", flush=True)

    for k, v in sorted(results.items()):
        print(k, f"{v*1e3:.3f} ms")
    # per-iteration slope between 2 and 8 iters
    for pp in (True, False):
        slope = (results[(8, pp)] - results[(2, pp)]) / 6.0
        fixed = results[(1, pp)] - (results[(2, pp)] - results[(1, pp)])
        print(f"per_point={pp}: per-iter {slope*1e3:.3f} ms, "
              f"1-iter {results[(1,pp)]*1e3:.3f} ms, est fixed {fixed*1e3:.3f} ms")


if __name__ == "__main__":
    main()
