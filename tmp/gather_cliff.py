"""Locate the TPU row-gather cliff: table bytes vs cost at 2M rows."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np

P = 2 * 1024 * 1024


def _sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def timeit(f, *a, n=10):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
f = jax.jit(lambda tbl, idx: tbl[idx])
for t, wdt in [(131072, 8), (131072, 16), (262144, 4), (262144, 16),
               (262144, 24), (262144, 32), (524288, 16)]:
    tbl = jax.random.normal(key, (t, wdt), jnp.float32)
    idx_np = np.minimum((np.abs(np.cumsum(np.random.default_rng(0).normal(
        0, 3, P))) % t).astype(np.int32), t - 1)
    idx = jnp.asarray(idx_np)
    ms = timeit(f, tbl, idx)
    mb = t * wdt * 4 / 1e6
    print(f"table ({t:7d},{wdt:2d}) {mb:6.1f} MB: {ms:7.2f} ms", flush=True)

# split-gather: two half-tables + select
t, wdt = 262144, 16
tbl = jax.random.normal(key, (t, wdt), jnp.float32)
idx = jnp.asarray(np.minimum((np.abs(np.cumsum(np.random.default_rng(0)
    .normal(0, 3, P))) % t).astype(np.int32), t - 1))


@jax.jit
def split2(tbl, idx):
    h = t // 2
    lo = tbl[:h][jnp.minimum(idx, h - 1)]
    hi = tbl[h:][jnp.maximum(idx - h, 0)]
    return jnp.where((idx < h)[:, None], lo, hi)


print(f"split2 (262144,16): {timeit(split2, tbl, idx):7.2f} ms", flush=True)

# bf16 variant (half the bytes)
tbl_h = tbl.astype(jnp.bfloat16)
fh = jax.jit(lambda tbl, idx: tbl[idx])
print(f"bf16  (262144,16): {timeit(fh, tbl_h, idx):7.2f} ms", flush=True)
