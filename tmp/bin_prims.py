"""Time the XLA primitives the per-tri binning pipeline needs (TPU)."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np

P = 512 * 1024          # pair capacity
T = 260 * 1024          # triangles
NT = 1020               # tiles


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[:1])     # force a device round-trip


def timeit(f, *a, n=20):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
cum = jnp.sort(jax.random.randint(key, (T,), 0, P)).astype(jnp.int32)
slots = jnp.arange(P, dtype=jnp.int32)

# 1. searchsorted: P queries over sorted (T,)
f = jax.jit(lambda c, s: jnp.searchsorted(c, s, side="right"))
tri_of = jax.block_until_ready(f(cum, slots))
print(f"searchsorted {P//1024}k over {T//1024}k: {timeit(f, cum, slots):.2f} ms",
      flush=True)

# 2. coherent scalar gathers: 4x (T,) int32 by sorted indices
idx_sorted = jnp.clip(tri_of, 0, T - 1)
g4 = jax.jit(lambda a, i: (a[i], a[i] + 1, a[i] * 2, a[i] ^ 3))
arr = jnp.arange(T, dtype=jnp.int32)
jax.block_until_ready(g4(arr, idx_sorted))
print(f"4 coherent scalar gathers: {timeit(g4, arr, idx_sorted):.2f} ms",
      flush=True)

# 3. two-operand sort (key int32, val int32), P elements
keys = jax.random.randint(key, (P,), 0, 1 << 30, dtype=jnp.int32)
vals = jnp.arange(P, dtype=jnp.int32)
srt = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
jax.block_until_ready(srt(keys, vals))
print(f"sort {P//1024}k (key,val): {timeit(srt, keys, vals):.2f} ms",
      flush=True)

# 4. row gather (P, 16) from (T, 16): random vs piecewise-ascending
rows = jax.random.normal(key, (T, 16), jnp.float32)
ridx = jax.random.randint(key, (P,), 0, T, dtype=jnp.int32)
gat = jax.jit(lambda r, i: r[i])
jax.block_until_ready(gat(rows, ridx))
print(f"row gather (P,16) RANDOM: {timeit(gat, rows, ridx):.2f} ms",
      flush=True)
# piecewise: 1020 tiles, ascending within each segment of ~512
pw = np.sort(np.asarray(ridx).reshape(1024, -1), axis=1).ravel()
pwj = jnp.asarray(pw)
print(f"row gather (P,16) PIECEWISE({NT} runs): {timeit(gat, rows, pwj):.2f} ms",
      flush=True)
# banded: 16 depth bands per tile -> 16320 ascending runs
pb = np.sort(np.asarray(ridx).reshape(1024 * 16, -1), axis=1).ravel()
print(f"row gather (P,16) BANDED(x16): {timeit(gat, rows, jnp.asarray(pb)):.2f} ms",
      flush=True)

# 5. scatter-add of P ones into (NT,) bins
tiles = jax.random.randint(key, (P,), 0, NT, dtype=jnp.int32)
sca = jax.jit(lambda t: jnp.zeros(NT, jnp.int32).at[t].add(1))
jax.block_until_ready(sca(tiles))
print(f"scatter-add {P//1024}k -> {NT}: {timeit(sca, tiles):.2f} ms",
      flush=True)

# 6. transpose (V,128,16)->(V,16,128) at V=5100
V = (P + 127) // 128
blocks = jax.random.normal(key, (V, 128, 16), jnp.float32)
tr = jax.jit(lambda b: b.transpose(0, 2, 1))
jax.block_until_ready(tr(blocks))
print(f"transpose (V,128,16)->(V,16,128): {timeit(tr, blocks):.2f} ms",
      flush=True)

# 7. stack 12 (T,) components into (T,12)
comps = [jax.random.normal(jax.random.PRNGKey(i), (T,), jnp.float32)
         for i in range(12)]
st = jax.jit(lambda *c: jnp.stack(c, -1))
jax.block_until_ready(st(*comps))
print(f"stack 12x(T,) -> (T,12): {timeit(st, *comps):.2f} ms", flush=True)
