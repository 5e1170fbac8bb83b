"""Quick re-measure of the per-point solve after the assembly rewrite."""

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

    for pp in (True, False):
        step = jax.jit(
            functools.partial(
                solve_ct_window, is_tsdf=True, num_iterations=8, per_point=pp
            )
        )
        out = step(hi, lo, problem, state, weights)
        _sync(out)
        print(f"per_point={pp} final_cost={float(out[1]):.6f} initial={float(out[2]):.6f}")
        med, _ = _chain_time(
            lambda: step(hi, lo, problem, state, weights), iters=16, repeats=3
        )
        print(f"solve iters=8 per_point={pp}: {med*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
