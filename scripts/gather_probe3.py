"""Microbench round 3: pyramid + contiguous window copy strategies."""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, W = 2, 512, 512
NV, NC = 9, 3
WIN = 120
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

cache = jax.device_put(
    np.random.rand(S, H, W, NV * NC).astype(np.float32))
rng = np.random.default_rng(0)
scene = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
ws_y = jnp.asarray(rng.integers(0, H - WIN, B).astype(np.int32))
ws_x = jnp.asarray(rng.integers(0, W - WIN, B).astype(np.int32))

# --- A: vmap(dynamic_slice) single level -----------------------------------
@jax.jit
def vds(cache, scene, ws_y, ws_x):
    def one(s, wy, wx):
        return jax.lax.dynamic_slice(cache, (s, wy, wx, 0),
                                     (1, WIN, WIN, NV * NC))[0]
    return jax.vmap(one)(scene, ws_y, ws_x)

# --- B: two-stage vmap dynamic_slice (rows then cols) -----------------------
@jax.jit
def vds2(cache, scene, ws_y, ws_x):
    def one(s, wy, wx):
        rows = jax.lax.dynamic_slice(cache, (s, wy, 0, 0),
                                     (1, WIN, W, NV * NC))[0]
        return jax.lax.dynamic_slice(rows, (0, wx, 0), (WIN, WIN, NV * NC))
    return jax.vmap(one)(scene, ws_y, ws_x)

# --- C: Pallas scalar-prefetch DMA gather (HBM -> HBM) ----------------------
def _gather_kernel(scene_ref, wy_ref, wx_ref, src_ref, out_ref, sem):
    b = pl.program_id(0)
    s = scene_ref[b]
    wy = wy_ref[b]
    wx = wx_ref[b]
    dma = pltpu.make_async_copy(
        src_ref.at[s, pl.ds(wy, WIN), pl.ds(wx, WIN), :],
        out_ref.at[b],
        sem,
    )
    dma.start()
    dma.wait()

@jax.jit
def pallas_gather(cache, scene, ws_y, ws_x):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B, WIN, WIN, NV * NC), cache.dtype),
        grid_spec=grid_spec,
    )(scene, ws_y, ws_x, cache)

r0 = vds(cache, scene, ws_y, ws_x)
r1 = vds2(cache, scene, ws_y, ws_x)
r2 = pallas_gather(cache, scene, ws_y, ws_x)
print('vds2 equal:', bool(jnp.all(r0 == r1)))
print('pallas equal:', bool(jnp.all(r0 == r2)))

timeit(vds, cache, scene, ws_y, ws_x, name='vmap dynamic_slice 2D')
timeit(vds2, cache, scene, ws_y, ws_x, name='vmap dynamic_slice rows->cols')
timeit(pallas_gather, cache, scene, ws_y, ws_x, name='pallas DMA gather')
