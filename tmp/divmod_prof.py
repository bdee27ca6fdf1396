"""Cost of int div/mod by a variable divisor at 512k on TPU."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np

N = 512 * 1024
key = jax.random.PRNGKey(0)
a = jax.random.randint(key, (N,), 0, 1 << 14, jnp.int32)
b = jax.random.randint(jax.random.PRNGKey(1), (N,), 1, 64, jnp.int32)


def _sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def timeit(f, *args, n=50):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def divmod_int(a, b):
    return a // b, a % b


@jax.jit
def divmod_f32(a, b):
    # floor(a/b) via f32 with exact integer correction
    q = jnp.floor(a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    r = a - q * b
    # correct off-by-one from f32 rounding
    q = jnp.where(r < 0, q - 1, jnp.where(r >= b, q + 1, q))
    r = a - q * b
    return q, r


print(f"int divmod 512k: {timeit(divmod_int, a, b):.2f} ms", flush=True)
print(f"f32 divmod 512k: {timeit(divmod_f32, a, b):.2f} ms", flush=True)
q1, r1 = divmod_int(a, b)
q2, r2 = divmod_f32(a, b)
print("parity:", bool(jnp.all(q1 == q2)), bool(jnp.all(r1 == r2)), flush=True)

# gather costs in isolation
tbl = jax.random.randint(key, (260000,), 0, 1 << 30, jnp.int32)
idx = jnp.cumsum(jax.random.bernoulli(key, 0.5, (N,)).astype(jnp.int32))


@jax.jit
def g3(tbl, idx):
    return tbl[idx], tbl[jnp.minimum(idx + 7, 259999)], tbl[jnp.maximum(idx - 3, 0)]


print(f"3 coherent gathers 512k: {timeit(g3, tbl, idx):.2f} ms", flush=True)
