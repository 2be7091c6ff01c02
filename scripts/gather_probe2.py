"""Microbench round 2: decompose and attack the gather cost."""
import time
import numpy as np
import jax
import jax.numpy as jnp

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
    print(f'{name:48s} {dt:8.2f} ms', flush=True)
    return dt

cache = jax.device_put(np.random.rand(S * H, W, NV, NC).astype(np.float32))
cache16 = cache.astype(jnp.bfloat16)
rng = np.random.default_rng(0)
scene = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
factor = jnp.asarray(rng.integers(1, MAXF + 1, B).astype(np.int32))
ws_y = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))
ws_x = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))

def rows_of(s, f, wy):
    return s * H + (wy + jnp.arange(WIN, dtype=jnp.int32)) * f
def cols_of(f, wx):
    return (wx + jnp.arange(WIN, dtype=jnp.int32)) * f

@jax.jit
def rows_only(cache, scene, factor, ws_y):
    def one(s, f, wy):
        return jnp.take(cache, rows_of(s, f, wy), axis=0)
    return jax.vmap(one)(scene, factor, ws_y)

@jax.jit
def both_takes(cache, scene, factor, ws_y, ws_x):
    def one(s, f, wy, wx):
        return jnp.take(jnp.take(cache, rows_of(s, f, wy), axis=0),
                        cols_of(f, wx), axis=1)
    return jax.vmap(one)(scene, factor, ws_y, ws_x)

# one-hot matmul row gather: (B*WIN, S*H) @ (S*H, W*NV*NC)
@jax.jit
def onehot_rows(cache, scene, factor, ws_y, ws_x):
    rows = jax.vmap(rows_of)(scene, factor, ws_y)          # (B, WIN)
    oh = jax.nn.one_hot(rows.reshape(-1), S * H, dtype=jnp.bfloat16)
    flat = cache.reshape(S * H, -1).astype(jnp.bfloat16)
    blk = (oh @ flat).reshape(B, WIN, W, NV, NC)
    def colpick(blk_b, f, wx):
        return jnp.take(blk_b, cols_of(f, wx), axis=1)
    return jax.vmap(colpick)(blk, factor, ws_x)

# one-hot for BOTH axes
@jax.jit
def onehot_both(cache, scene, factor, ws_y, ws_x):
    rows = jax.vmap(rows_of)(scene, factor, ws_y)
    oh = jax.nn.one_hot(rows.reshape(-1), S * H, dtype=jnp.bfloat16)
    flat = cache.reshape(S * H, -1).astype(jnp.bfloat16)
    blk = (oh @ flat).reshape(B, WIN, W, NV * NC)
    cols = jax.vmap(cols_of)(factor, ws_x)                 # (B, WIN)
    ohc = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)      # (B, WIN, W)
    # out[b,h,c,k] = sum_w blk[b,h,w,k] * ohc[b,c,w]
    out = jnp.einsum('bhwk,bcw->bhck', blk, ohc)
    return out.reshape(B, WIN, WIN, NV, NC)

r0 = both_takes(cache, scene, factor, ws_y, ws_x)
r1 = onehot_rows(cache, scene, factor, ws_y, ws_x)
print('onehot_rows equal:', bool(jnp.allclose(r0.astype(jnp.bfloat16), r1)))
r2 = onehot_both(cache, scene, factor, ws_y, ws_x)
print('onehot_both close:', bool(jnp.allclose(r0, r2.astype(jnp.float32), atol=1e-2)))

timeit(both_takes, cache, scene, factor, ws_y, ws_x, name='both takes fp32')
timeit(both_takes, cache16, scene, factor, ws_y, ws_x, name='both takes bf16 cache')
timeit(onehot_rows, cache, scene, factor, ws_y, ws_x, name='onehot rows + take cols')
timeit(onehot_both, cache, scene, factor, ws_y, ws_x, name='onehot rows + onehot cols')
