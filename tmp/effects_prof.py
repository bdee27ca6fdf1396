import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
from d3d12renderer_tpu.render import post
def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
def timeit(f, *a, n=10):
    r = f(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3
key = jax.random.PRNGKey(0)
H, W = 1080, 1920
vp = jax.random.normal(key, (H, W, 3)) * 5
n = vp / jnp.linalg.norm(vp, axis=-1, keepdims=True)
motion = jax.random.normal(key, (H//2, W//2, 2))
hist = jnp.ones((H//2, W//2))
depth_full = jnp.abs(vp[..., 2])
f = jax.jit(lambda vp: post.downsample2(vp))
stamp(f"downsample2: {timeit(f, vp):.1f} ms")
vp_low = f(vp)
n_low = jax.jit(lambda n: post.downsample2(n))(n)
depth_low = jnp.abs(vp_low[..., 2])
f = jax.jit(lambda a, b: post.hbao(a, b, key=key))
stamp(f"hbao half-res: {timeit(f, vp_low, n_low):.1f} ms")
ao_low = f(vp_low, n_low)
f = jax.jit(lambda a, h, m: post.temporal_accumulate(a, h, m, first=jnp.asarray(False)))
stamp(f"temporal_accumulate: {timeit(f, ao_low, hist, motion):.1f} ms")
f = jax.jit(lambda a, dl, df: post.bilateral_upsample(a, dl, df))
stamp(f"bilateral_upsample: {timeit(f, ao_low, depth_low, depth_full):.1f} ms")
