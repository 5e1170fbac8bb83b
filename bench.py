"""Benchmark: scan-matcher throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): scan-matches/s/chip for the online
matcher (dense correlative + Gauss-Newton refinement, the reference's
RealTimeCorrelativeScanMatcher2D + CeresScanMatcher2D pair, ref:
local_trajectory_builder_2d.cc ScanMatch:65-102).

Baseline: the reference publishes no numbers (BASELINE.md). Until the
C++ pipeline is run on this machine, vs_baseline is computed against a
documented estimate of the C++ online matcher: Cartographer's RTCSM+Ceres
on one CPU core handles roughly 50-100 scans/s at these window sizes
(0.15 m / 10 deg window, ~500-point clouds, 20 GN iterations); we use
100/s as a deliberately generous reference point.
"""

from __future__ import annotations

import json
import time

import numpy as np

CPP_BASELINE_MATCHES_PER_S = 100.0


def main() -> None:
    import jax

    from __graft_entry__ import entry

    step, (grid, cloud, initial) = entry()
    jit_step = jax.jit(step)

    # Batch the matcher: many scans against the same submap, vmapped —
    # this is how the TPU build amortizes launch overhead (SURVEY.md §7
    # "batch, don't queue").
    import jax.numpy as jnp

    from hectorgrapher_tpu.sensor.types import PointCloud
    from hectorgrapher_tpu.transform.rigid import Rigid2

    batch = 128
    clouds = PointCloud(
        positions=jnp.broadcast_to(cloud.positions, (batch,) + cloud.positions.shape),
        mask=jnp.broadcast_to(cloud.mask, (batch,) + cloud.mask.shape),
    )
    initials = Rigid2(
        translation=jnp.broadcast_to(initial.translation, (batch, 2)),
        angle=jnp.broadcast_to(initial.angle, (batch,)),
    )

    batched = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))

    # Warm up / compile.
    out = batched(grid, clouds, initials)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched(grid, clouds, initials)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    matches_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "scan_matches_per_s_per_chip",
                "value": round(matches_per_s, 1),
                "unit": "matches/s",
                "vs_baseline": round(matches_per_s / CPP_BASELINE_MATCHES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
