"""Decompose one expansion level of the fm kernel at production shapes.
B=32 cands, K=256 parents, P=512 pts, X=Y=2, table (S*depth*(nx+1), ny)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            jax.device_get(leaf.ravel()[:1]); return

def chain_time(fn, iters=6, repeats=2):
    def run(n):
        t0 = time.perf_counter(); out=None
        for _ in range(n): out = fn()
        _sync(out); return time.perf_counter()-t0
    run(1); slopes=[]
    for _ in range(repeats):
        t1=run(1); tn=run(iters); slopes.append(max(tn-t1,1e-9)/(iters-1))
    return float(np.median(slopes))

B, K, P, NY = 32, 256, 512, 256
R = 32 * 7 * 257  # table rows
rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((R, NY)).astype(np.float32)).astype(jnp.bfloat16)
ix = jnp.asarray(rng.integers(0, R, (B, K, P, 2)).astype(np.int32))
iy = jnp.asarray(rng.integers(0, NY, (B, K, P, 2)).astype(np.int32))

@jax.jit
def gather_only(ix):
    rows = table[ix]  # (B, K, P, 2, NY)
    return jnp.sum(rows.astype(jnp.float32), axis=(-1, -2, -3))

@jax.jit
def full(ix, iy):
    rows = table[ix]
    oh = jax.nn.one_hot(iy, NY, dtype=table.dtype)
    return jnp.einsum("bkpxc,bkpyc->bkxy", rows, oh, preferred_element_type=jnp.float32)

@jax.jit
def full_mulsum(ix, iy):
    rows = table[ix]
    oh = jax.nn.one_hot(iy, NY, dtype=table.dtype)
    prod = rows[..., :, None, :].astype(jnp.float32) * oh[..., None, :, :].astype(jnp.float32)
    return jnp.sum(prod, axis=(-1, -3))

@jax.jit
def pick_scalar(ix, iy):
    # direct scalar pick: flat scalar gather of the picked cells only
    flat = ix[..., :, None] * NY + iy[..., None, :]  # (B,K,P,2,2)
    v = table.reshape(-1)[flat]
    return jnp.sum(v.astype(jnp.float32), axis=-3)

rows_n = B * K * P * 2
for name, fn in [
    ("gather_only", lambda: gather_only(ix)),
    ("full_einsum", lambda: full(ix, iy)),
    ("full_mulsum", lambda: full_mulsum(ix, iy)),
    ("pick_scalar", lambda: pick_scalar(ix, iy)),
]:
    try:
        t = chain_time(fn)
        print(f"{name:>12}: {t*1e3:8.1f} ms  ({rows_n/t/1e6:6.0f} M rows/s)", flush=True)
    except Exception as e:
        print(f"{name:>12}: FAIL {e}", flush=True)

@jax.jit
def full_fused(ix, iy):
    rows = table[ix]  # (B,K,P,2,NY) bf16
    lanes = jnp.arange(NY, dtype=iy.dtype)
    eq = iy[..., None] == lanes  # (B,K,P,2y,NY) bool
    prod = jnp.where(eq[..., None, :, :], rows[..., :, None, :], jnp.bfloat16(0))
    return jnp.sum(prod, axis=(-1, -4), dtype=jnp.float32)  # sum c and p -> (B,K,2,2)

@jax.jit
def full_fused2(ix, iy):
    rows = table[ix]
    lanes = jnp.arange(NY, dtype=iy.dtype)
    eq = (iy[..., None] == lanes).astype(jnp.bfloat16)
    prod = rows[..., :, None, :] * eq[..., None, :, :]
    return jnp.sum(prod, axis=(-1, -4), dtype=jnp.float32)

for name, fn in [
    ("full_fused", lambda: full_fused(ix, iy)),
    ("full_fused2", lambda: full_fused2(ix, iy)),
]:
    try:
        t = chain_time(fn)
        print(f"{name:>12}: {t*1e3:8.1f} ms  ({rows_n/t/1e6:6.0f} M rows/s)", flush=True)
    except Exception as e:
        print(f"{name:>12}: FAIL {str(e)[:200]}", flush=True)
