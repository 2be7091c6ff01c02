"""Round-3 probe v2: stage costs of the FOLD-path augmentation.

Unlike augment_probe.py (whose per-stage outputs materialized in
pathological layouts and overstated the rot stage 2x), every stage here
is a cumulative prefix ending in jnp.sum — XLA fuses freely and the
deltas are honest compute costs.  The last row times the REAL
gather_augment(parity=True, fold=True) with its true outputs.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/augment_probe2.py
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
    print(f'  {name:44s} {dt:9.2f} ms', flush=True)
    return dt


def main():
    import optax  # noqa: F401
    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data import augment2 as A2
    from mmlf_tpu.data.pipeline import DevicePipeline, window_size
    from mmlf_tpu.ops.pallas.window_gather import window_gather
    from mmlf_tpu.data.pipeline import gather_augment

    print(f'device: {jax.devices()[0]}', flush=True)
    bs, ps = 128, 96
    cfg = Config(train_trainset='/tmp/mmlf_bench_data', train_bs=bs,
                 train_ps=ps, train_shift=0.0, model_uncert=True,
                 bf16=True, cache_bf16=True, model_chs=70).finalize()
    ds = HCI4D(cfg.train_trainset, cache=True, length=4096)
    pipe = DevicePipeline(ds, cfg, seed=0)
    win = window_size(ps)
    cache, batch = pipe.cache, pipe.sample_batch(bs)
    views = cache.views
    q = 4 * views

    def upto(stage):
        def f(c, b):
            img, aux, _ = window_gather(
                c.img, c.aux, c.mpi, b.scene, b.factor - 1, b.ws_y,
                b.ws_x, win, with_mpi=False)
            if stage == 'gather':
                return jnp.sum(img[..., :1].astype(jnp.float32)) + \
                    jnp.sum(aux[..., :1])
            aug = b.aug
            bb, win_ = img.shape[0], img.shape[1]
            dtype = img.dtype
            offs = jnp.arange(views, dtype=jnp.float32) - float(views // 2)
            x0 = img[..., :q * 3].reshape(bb, win_, win_, q, 3)
            x0 = jnp.transpose(x0, (0, 3, 1, 2, 4)).reshape(
                bb, q, win_, win_ * 3)
            s_amt = aug.shift[:, None, None] * offs[None, None, :]
            row_amt = (s_amt * A2.ROW_SIGN[None, :, None]).reshape(bb, q)
            col_amt = (s_amt * A2.COL_SIGN[None, :, None]).reshape(bb, q)
            y0 = (aug.y_off + A2.EXTRA_HALF).astype(jnp.int32)
            x0o = (aug.x_off + A2.EXTRA_HALF).astype(jnp.int32)
            k1 = aug.rot_k
            rev1 = (k1 == 2) | (k1 == 3)
            rev2 = (k1 == 1) | (k1 == 2)
            r1 = A2._shift_matrix(row_amt, y0, ps, win_, dtype, rev=rev1)
            x1 = jnp.einsum('bqyY,bqYl->bqyl', r1, x0)
            if stage == 'rows':
                return jnp.sum(x1.astype(jnp.float32))
            x1t = x1.reshape(bb, q, ps, win_, 3).swapaxes(2, 3).reshape(
                bb, q, win_, ps * 3)
            r2 = A2._shift_matrix(col_amt, x0o, ps, win_, dtype, rev=rev2)
            x2 = jnp.einsum('bqyY,bqYl->bqyl', r2, x1t)
            if stage == 'cols':
                return jnp.sum(x2.astype(jnp.float32))
            b2 = bb // 2
            x4 = jnp.concatenate(
                [A2._spatial_T(x2[:b2], ps), x2[b2:]], axis=0)
            if stage == 'transpose':
                return jnp.sum(x4.astype(jnp.float32))
            z2 = x4.reshape(bb, q, ps, ps, 3)
            qin = jnp.asarray(A2._relabel_table(views))[aug.rot_k]
            perm = jax.nn.one_hot(qin, q, dtype=jnp.float32)
            m = perm[:, :, None, :, None] * aug.color[:, None, :, None, :]
            m = m * aug.brightness[:, None, None, None, None]
            m = m.reshape(bb, q * 3, q, 3)
            out = jnp.einsum('bqyxc,bPqc->byxP', z2.astype(jnp.float32),
                             m, precision=jax.lax.Precision.HIGHEST)
            n3 = views * 3
            pivot = jnp.mean(out[..., :n3], axis=(1, 2, 3)) * \
                (1.0 - aug.contrast)
            out = out * aug.contrast[:, None, None, None] + \
                pivot[:, None, None, None]
            return jnp.sum(out)
        return jax.jit(f)

    for stage in ('gather', 'rows', 'cols', 'transpose', 'all'):
        timeit(upto(stage), cache, batch, name=f'sum upto {stage}')

    real = jax.jit(lambda c, b: gather_augment(
        c, b, ps, win, with_mpi=False, parity=True, fold=True))
    timeit(real, cache, batch, name='real gather_augment fold (outputs)')


if __name__ == '__main__':
    main()
