"""Microbench: scoring-formulation candidates for the 2D fast matcher.

A. scalar gather from a flat (65537,) table          (current kernel)
B. row gather (257,256) + one-hot lane pick, chunked (proposed)
C. count-image + shifted-table matmul correlation     (proposed, coarse)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1])
            return


def chain_time(fn, iters=8, repeats=3):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        _sync(out)
        return time.perf_counter() - t0

    run(2)
    slopes = []
    for _ in range(repeats):
        t1 = run(1)
        tn = run(iters)
        slopes.append(max(tn - t1, 1e-9) / (iters - 1))
    return float(np.median(slopes))


NX, NY = 256, 256
B, K, N = 32, 1024, 512  # expansion stage shape (per level: K = 4*top_k)

rng = np.random.default_rng(0)
table_flat = jnp.asarray(rng.random((NX * NY + 1,)).astype(np.float32))
table2d = jnp.asarray(rng.random((NX + 1, NY)).astype(np.float32))
ix = jnp.asarray(rng.integers(0, NX, (B, K, N)).astype(np.int32))
iy = jnp.asarray(rng.integers(0, NY, (B, K, N)).astype(np.int32))
flat_idx = ix * NY + iy


@jax.jit
def scalar_gather(flat_idx):
    v = table_flat[flat_idx]
    return jnp.sum(v, axis=-1)


@jax.jit
def row_onehot(ix, iy):
    # scan over point chunks to bound the materialized row tensor
    CH = 64
    nch = N // CH

    def body(acc, args):
        ixc, iyc = args  # (B, K, CH)
        rows = table2d[ixc]  # (B, K, CH, NY)
        oh = jax.nn.one_hot(iyc, NY, dtype=rows.dtype)
        return acc + jnp.einsum("bkcy,bkcy->bk", rows, oh), None

    ix_c = jnp.moveaxis(ix.reshape(B, K, nch, CH), 2, 0)
    iy_c = jnp.moveaxis(iy.reshape(B, K, nch, CH), 2, 0)
    acc, _ = jax.lax.scan(body, jnp.zeros((B, K), jnp.float32), (ix_c, iy_c))
    return acc


@jax.jit
def row_onehot_dot(ix, iy):
    # one-hot pick via dot_general on the lane axis (MXU-friendly shape)
    CH = 64
    nch = N // CH

    def body(acc, args):
        ixc, iyc = args
        rows = table2d[ixc]  # (B, K, CH, NY)
        oh = jax.nn.one_hot(iyc, NY, dtype=rows.dtype)
        v = jnp.sum(rows * oh, axis=-1)  # (B, K, CH)
        return acc + jnp.sum(v, axis=-1), None

    ix_c = jnp.moveaxis(ix.reshape(B, K, nch, CH), 2, 0)
    iy_c = jnp.moveaxis(iy.reshape(B, K, nch, CH), 2, 0)
    acc, _ = jax.lax.scan(body, jnp.zeros((B, K), jnp.float32), (ix_c, iy_c))
    return acc


# C: coarse-stage correlation. Per (b, t): count image C_t (NX, NY) from
# scatter; score(t, j, k) = <C_t, shift(table, oxj, oyk)>.
T_ANG = 113
OFF = 7
pts_ix = jnp.asarray(rng.integers(0, NX, (B, T_ANG, N)).astype(np.int32))
pts_iy = jnp.asarray(rng.integers(0, NY, (B, T_ANG, N)).astype(np.int32))
offs = (np.arange(OFF) - OFF // 2) * 64


@jax.jit
def corr_matmul(pts_ix, pts_iy):
    flat = pts_ix * NY + pts_iy  # (B, T, N)
    C = jnp.zeros((B, T_ANG, NX * NY), jnp.bfloat16)
    upd = jnp.ones((B, T_ANG, N), jnp.bfloat16)
    C = C.at[
        jnp.arange(B)[:, None, None], jnp.arange(T_ANG)[None, :, None], flat
    ].add(upd)
    # shifted tables: (OFF*OFF, NX*NY)
    t2 = table2d[:NX]
    W = []
    for j in offs:
        for k in offs:
            W.append(jnp.roll(jnp.roll(t2, -j, 0), -k, 1).reshape(-1))
    W = jnp.stack(W).astype(jnp.bfloat16)  # (49, 65536)
    scores = jnp.einsum("btf,of->bto", C, W)  # (B, T, 49)
    return scores.astype(jnp.float32)


def report(name, fn, rows, iters=8):
    print(f"{name}: compiling/warming...", flush=True)
    t0 = time.perf_counter()
    _sync(fn())
    print(f"{name}: first call (incl compile) {time.perf_counter() - t0:.1f}s", flush=True)
    t = chain_time(fn, iters=iters, repeats=2)
    print(f"{name:>16}: {t * 1e3:8.2f} ms  -> {rows / t / 1e6:8.1f} M rows/s", flush=True)
    return t


print("expansion-stage shapes (B=32, K=1024, N=512): rows = B*K*N =", B * K * N, flush=True)
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "a"):
    report("scalar_gather", lambda: scalar_gather(flat_idx), B * K * N, iters=4)
if which in ("all", "b"):
    report("row_onehot", lambda: row_onehot(ix, iy), B * K * N, iters=4)
    report("row_onehot_dot", lambda: row_onehot_dot(ix, iy), B * K * N, iters=4)
if which in ("all", "c"):
    t = report("corr_matmul", lambda: corr_matmul(pts_ix, pts_iy), B * T_ANG * N, iters=4)
    print(f"corr_matmul scores B*T*49 = {B * T_ANG * 49}, flops = {2 * B * T_ANG * 49 * NX * NY / 1e9:.1f} GFLOP -> {2 * B * T_ANG * 49 * NX * NY / t / 1e12:.2f} TFLOP/s", flush=True)
