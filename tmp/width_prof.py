import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
def sync(x): np.asarray(x.ravel()[:1])
def timeit(f, *a, n=10):
    r = f(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3
P = 2 * 1024 * 1024
T = 262144
key = jax.random.PRNGKey(0)
idx = jnp.asarray(np.minimum((np.abs(np.cumsum(np.random.default_rng(0)
    .normal(0, 3, P))) % T).astype(np.int32), T - 1))
f = jax.jit(lambda tbl, idx: tbl[idx])
for wdt in (16, 19, 24, 28, 32):
    tbl = jax.random.normal(key, (T, wdt), jnp.float32)
    print(f"width {wdt}: {timeit(f, tbl, idx):7.2f} ms", flush=True)
# 128-wide (one full lane tile)
tbl = jax.random.normal(key, (T, 128), jnp.float32)
print(f"width 128: {timeit(f, tbl, idx):7.2f} ms", flush=True)
