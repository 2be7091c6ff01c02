"""Microbench round 4: tile-aligned 128-channel cache layouts."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, W = 2, 512, 512
C = 128           # 4 stacks * 9 views * 3 colors = 108 -> padded to 128
WIN = 128
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

cache = jax.device_put(np.random.rand(S, H, W, C).astype(np.float32))
rng = np.random.default_rng(0)
scene = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
ws_y = jnp.asarray(rng.integers(0, H - WIN, B).astype(np.int32))
ws_x = jnp.asarray((rng.integers(0, (W - WIN) // 8, B) * 8).astype(np.int32))

@jax.jit
def vds(cache, scene, ws_y, ws_x):
    def one(s, wy, wx):
        return jax.lax.dynamic_slice(cache, (s, wy, wx, 0),
                                     (1, WIN, WIN, C))[0]
    return jax.vmap(one)(scene, ws_y, ws_x)

def _gather_kernel(scene_ref, wy_ref, wx_ref, src_ref, out_ref, sem):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(
        src_ref.at[scene_ref[b], pl.ds(wy_ref[b], WIN),
                   pl.ds(wx_ref[b], WIN), :],
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
        out_shape=jax.ShapeDtypeStruct((B, WIN, WIN, C), cache.dtype),
        grid_spec=grid_spec,
    )(scene, ws_y, ws_x, cache)

# double-buffered variant: start DMA b+1 while waiting on b
def _gather_kernel2(scene_ref, wy_ref, wx_ref, src_ref, out_ref, sem):
    b = pl.program_id(0)
    def dma_for(i, slot):
        return pltpu.make_async_copy(
            src_ref.at[scene_ref[i], pl.ds(wy_ref[i], WIN),
                       pl.ds(wx_ref[i], WIN), :],
            out_ref.at[i],
            sem.at[slot],
        )
    @pl.when(b == 0)
    def _():
        dma_for(0, 0).start()
    @pl.when(b + 1 < B)
    def _():
        dma_for(b + 1, (b + 1) % 2).start()
    dma_for(b, b % 2).wait()

@jax.jit
def pallas_gather2(cache, scene, ws_y, ws_x):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _gather_kernel2,
        out_shape=jax.ShapeDtypeStruct((B, WIN, WIN, C), cache.dtype),
        grid_spec=grid_spec,
    )(scene, ws_y, ws_x, cache)

r0 = vds(cache, scene, ws_y, ws_x)
r1 = pallas_gather(cache, scene, ws_y, ws_x)
r2 = pallas_gather2(cache, scene, ws_y, ws_x)
print('pallas equal:', bool(jnp.all(r0 == r1)), bool(jnp.all(r0 == r2)))

timeit(vds, cache, scene, ws_y, ws_x, name='vmap dynamic_slice (128ch aligned)')
timeit(pallas_gather, cache, scene, ws_y, ws_x, name='pallas DMA gather')
timeit(pallas_gather2, cache, scene, ws_y, ws_x, name='pallas DMA gather (dbl-buffered)')
# ideal: read+write 2 * 64*128*128*128*4B = 1.07GB -> ~1.3 ms at 819GB/s
