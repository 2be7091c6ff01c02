"""Round-3 probe: where do the ~50 ms of gather+augment go at bs=128?

Times the gather alone, then augment_packed cut at successive stages,
each as its own jit (stage outputs materialize, so deltas are upper
bounds, but the hot stage shows up unambiguously).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/augment_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def sync(r):
    leaf = [l for l in jax.tree_util.tree_leaves(r)
            if hasattr(l, 'ravel')][0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=10, name=''):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f'  {name:40s} {dt:9.2f} ms', flush=True)
    return dt


def main():
    import optax  # noqa: F401
    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data import augment2 as A2
    from mmlf_tpu.data.pipeline import DevicePipeline, window_size
    from mmlf_tpu.ops.pallas.window_gather import window_gather

    print(f'device: {jax.devices()[0]}', flush=True)
    bs, ps = 128, 96
    cfg = Config(train_trainset='/tmp/mmlf_bench_data', train_bs=bs,
                 train_ps=ps, train_shift=0.0, model_uncert=True,
                 bf16=True, cache_bf16=True, model_chs=64).finalize()
    ds = HCI4D(cfg.train_trainset, cache=True, length=4096)
    pipe = DevicePipeline(ds, cfg, seed=0)
    win = window_size(ps)
    cache, batch = pipe.cache, pipe.sample_batch(bs)
    views = cache.views

    gather = jax.jit(lambda c, b: window_gather(
        c.img, c.aux, c.mpi, b.scene, b.factor - 1, b.ws_y, b.ws_x, win,
        with_mpi=False))
    timeit(gather, cache, batch, name='gather only (img+aux)')

    img, aux, _ = jax.block_until_ready(gather(cache, batch))
    img = jnp.asarray(np.asarray(img))
    aug = batch.aug

    q = 4 * views
    offs = jnp.arange(views, dtype=jnp.float32) - float(views // 2)

    def stage(upto):
        def f(img, aug):
            b_, win_ = img.shape[0], img.shape[1]
            dtype = img.dtype
            x0 = img[..., :q * 3].reshape(b_, win_, win_, q, 3)
            x0 = jnp.transpose(x0, (0, 3, 1, 2, 4)).reshape(
                b_, q, win_, win_ * 3)
            if upto == 'unpack':
                return x0
            s_amt = aug.shift[:, None, None] * offs[None, None, :]
            row_amt = (s_amt * A2.ROW_SIGN[None, :, None]).reshape(b_, q)
            col_amt = (s_amt * A2.COL_SIGN[None, :, None]).reshape(b_, q)
            y0 = (aug.y_off + A2.EXTRA_HALF).astype(jnp.int32)
            x0o = (aug.x_off + A2.EXTRA_HALF).astype(jnp.int32)
            r1 = A2._shift_matrix(row_amt, y0, ps, win_, dtype)
            if upto == 'r1build':
                return r1
            x1 = jnp.einsum('bqyY,bqYl->bqyl', r1, x0)
            if upto == 'rows':
                return x1
            x1t = x1.reshape(b_, q, ps, win_, 3).swapaxes(2, 3).reshape(
                b_, q, win_, ps * 3)
            r2 = A2._shift_matrix(col_amt, x0o, ps, win_, dtype)
            x2 = jnp.einsum('bqyY,bqYl->bqyl', r2, x1t)
            if upto == 'cols':
                return x2
            qin = jnp.asarray(A2._relabel_table(views))[aug.rot_k]
            perm = jax.nn.one_hot(qin, q, dtype=dtype)
            x3 = jnp.einsum('bpq,bqyl->bpyl', perm, x2)
            if upto == 'perm':
                return x3
            k = aug.rot_k[:, None, None, None]
            x3t = A2._spatial_T(x3, ps)
            x4 = jnp.where((k % 2) == 1, x3, x3t)
            frow = (k == 1) | (k == 2)
            flane = (k == 2) | (k == 3)
            x5 = jnp.where(frow, jnp.flip(x4, axis=2), x4)
            x5r = x5.reshape(b_, q, ps, ps, 3)
            x6 = jnp.where(flane[..., None], jnp.flip(x5r, axis=3), x5r)
            if upto == 'rot':
                return x6
            x6 = x6.astype(jnp.float32)
            x7 = jnp.einsum('bqyxc,bdc->bqyxd', x6, aug.color,
                            precision=jax.lax.Precision.HIGHEST)
            x7 = x7 * aug.brightness[:, None, None, None, None]
            if upto == 'color':
                return x7
            pivot = jnp.mean(x7[:, :views], axis=(1, 2, 3, 4)) * \
                (1.0 - aug.contrast)
            x8 = x7 * aug.contrast[:, None, None, None, None] + \
                pivot[:, None, None, None, None]
            return x8
        return jax.jit(f)

    for name in ('unpack', 'r1build', 'rows', 'cols', 'perm', 'rot',
                 'color', 'all'):
        timeit(stage(name), img, aug, name=f'augment upto {name}')

    full = jax.jit(lambda i, a: A2.augment_packed(i, a, ps, views))
    timeit(full, img, aug, name='augment_packed (module)')


if __name__ == '__main__':
    main()
