"""TPU row-gather cost vs table size and row width (2M coherent indices)."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np

P = 2 * 1024 * 1024


def _sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def timeit(f, *a, n=20):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
for t in (4096, 65536, 262144):
    for wdt in (1, 8, 16):
        tbl = jax.random.normal(key, (t, wdt), jnp.float32)
        # pixel-coherent indices: a blurred random field
        idx_np = np.minimum(
            (np.abs(np.cumsum(np.random.default_rng(0).normal(
                0, 3, P))) % t).astype(np.int32), t - 1)
        idx = jnp.asarray(idx_np)
        f = jax.jit(lambda tbl, idx: tbl[idx])
        ms = timeit(f, tbl, idx)
        print(f"table ({t:7d},{wdt:2d}) gather 2M rows: {ms:7.2f} ms",
              flush=True)

# one-hot matmul alternative for small tables
t = 4096
tbl = jax.random.normal(key, (t, 16), jnp.float32)
idx = jnp.asarray(np.minimum((np.abs(np.cumsum(np.random.default_rng(0)
    .normal(0, 3, P))) % t).astype(np.int32), t - 1))


@jax.jit
def onehot_mm(tbl, idx):
    oh = jax.nn.one_hot(idx, t, dtype=jnp.bfloat16)
    return jnp.dot(oh, tbl.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


print(f"one-hot matmul (4096,16): {timeit(onehot_mm, tbl, idx):7.2f} ms",
      flush=True)
