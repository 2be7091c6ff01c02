"""Microbench: current double-take gather vs switch+dynamic_slice gather."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

S, H, W = 2, 512, 512
NV, NC = 9, 3
WIN = 120
MAXF = 4
B = 64

def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(x.ravel()[:1]))

def timeit(fn, *args, n=10, name=''):
    for _ in range(2):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / n * 1000
    print(f'{name:45s} {dt:8.2f} ms', flush=True)
    return dt

key = jax.random.PRNGKey(0)
cache = jax.device_put(np.random.rand(S * H, W, NV, NC).astype(np.float32))
rng = np.random.default_rng(0)
scene = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
factor = jnp.asarray(rng.integers(1, MAXF + 1, B).astype(np.int32))
ws_y = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))
ws_x = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))

# --- current: double take -------------------------------------------------
@jax.jit
def gather_take(cache, scene, factor, ws_y, ws_x):
    def one(s, f, wy, wx):
        rows = s * H + (wy + jnp.arange(WIN, dtype=jnp.int32)) * f
        cols = (wx + jnp.arange(WIN, dtype=jnp.int32)) * f
        return jnp.take(jnp.take(cache, rows, axis=0), cols, axis=1)
    return jax.vmap(one)(scene, factor, ws_y, ws_x)

# --- switch over static f: contiguous dynamic_slice + static stride --------
@jax.jit
def gather_switch(cache, scene, factor, ws_y, ws_x):
    def one(s, f, wy, wx):
        def branch(fs):
            def g(_):
                blk = jax.lax.dynamic_slice(
                    cache, (s * H + wy * fs, wx * fs, 0, 0),
                    (WIN * fs, WIN * fs, NV, NC))
                return blk[::fs, ::fs]
            return g
        return jax.lax.switch(f - 1, [branch(fs) for fs in range(1, MAXF + 1)],
                              None)
    return jax.vmap(one)(scene, factor, ws_y, ws_x)

r1 = gather_take(cache, scene, factor, ws_y, ws_x)
r2 = gather_switch(cache, scene, factor, ws_y, ws_x)
print('equal:', bool(jnp.all(r1 == r2)))

timeit(gather_take, cache, scene, factor, ws_y, ws_x, name='double take')
timeit(gather_switch, cache, scene, factor, ws_y, ws_x, name='switch+dynamic_slice')

# f=1 only (no downscale augment case)
f1 = jnp.ones(B, jnp.int32)
timeit(gather_take, cache, scene, f1, ws_y, ws_x, name='double take (f=1)')
timeit(gather_switch, cache, scene, f1, ws_y, ws_x, name='switch+ds (f=1)')
