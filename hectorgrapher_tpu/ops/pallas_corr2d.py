"""Pallas TPU kernel: fused score assembly for the 2D correlative matcher.

Computes the (angle, offset) score volume from the gathered wide-patch
rows and the prepped group deltas — the one-hot bucket matmul plus the
combine stage of correlative_2d._scores_from_prep, fused so that neither
the (B, G, 125, N) one-hot weights nor the (B, G, 125, pw^2) bucket ever
touch HBM (~3 GB of traffic per 1024-batch in the XLA path).

Per (match, group) the kernel:
  1. builds the j-major one-hot weights in VMEM: W[j*gsz + l, n] = 1 iff
     angle l of the group saw cell delta j at point n (pltpu.repeat of
     the 5 delta rows + one iota compare — no HBM materialization);
  2. one MXU dot W @ rows -> bucket (gsz^3, pw^2) f32 in VMEM;
  3. combines buckets into scores IN WIDE-LANE COORDINATES: the 7x7
     score window of delta j sits at static lane offset c_j = jx*pw + jy
     inside the 11x11 patch, so combine = 25 static lane-rolls + adds
     (pltpu.roll) — scores_wide[l, ox*pw + oy] is the score at offset
     (ox, oy). The caller applies the penalty/argmax on a wide-lane
     layout (cheap XLA) instead of repacking to d^2 lanes.

Semantics identical to the XLA path up to f32 summation order (both sum
the same 25 bucket windows per score).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # padded pw^2 (121 for ANGLE_GROUP=5, k=3)


def _make_kernel(n_groups: int, gsz: int, pw: int):
    n_j = gsz * gsz

    def kernel(dlin_ref, valid_ref, rows_ref, out_ref):
        valid = valid_ref[0] > 0.0  # (1, N)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (n_j * gsz, 1), 0)
        j_of_r = r_iota // gsz

        for g in range(n_groups):
            dlin5 = dlin_ref[0, g * gsz : (g + 1) * gsz, :]
            dlin_t = pltpu.repeat(dlin5, n_j, axis=0)
            w = ((dlin_t == j_of_r) & valid).astype(jnp.bfloat16)
            bucket = jnp.dot(w, rows_ref[0, g], preferred_element_type=jnp.float32)
            acc = jnp.zeros((gsz, LANES), jnp.float32)
            for j in range(n_j):
                jx, jy = j // gsz, j % gsz
                block = bucket[j * gsz : (j + 1) * gsz, :]
                # roll left by c_j: out[q] = block[q + c_j] (mod LANES)
                acc = acc + pltpu.roll(block, (LANES - (jx * pw + jy)) % LANES, 1)
            out_ref[0, g * gsz : (g + 1) * gsz, :] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_groups", "gsz", "pw", "interpret")
)
def correlative_scores_2d_batched(
    dlin, valid, rows, n_groups: int, gsz: int, pw: int, interpret: bool = False
):
    """scores_wide (B, n_groups*gsz, LANES) f32: lane ox*pw + oy holds the
    UNNORMALIZED score sum at offset (ox, oy) for each (padded) angle.

    dlin: (B, T, N) int32 group deltas; valid: (B, N) f32 0/1 masks;
    rows: (B, G, N, LANES) bf16 wide-patch rows (lanes >= pw^2 zero).
    """
    b, t_pad, n = dlin.shape
    valid = valid.reshape(b, 1, n)
    return pl.pallas_call(
        _make_kernel(n_groups, gsz, pw),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, LANES), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n_groups, n, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_pad, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(dlin, valid, rows)
