"""Round-3 probe: decompose the train step's time (VERDICT r2 items 1-2).

Times, for several (chs, bs) configs on the real chip:
  full   — the fused step exactly as bench.py runs it
  fwdbwd — value_and_grad of the loss on FIXED pre-gathered windows
  fwd    — forward + loss only
  gather — gather_augment (Pallas window gather + matmul augmentation) only
  adam   — optimizer update only

plus a bs sweep of `full` to localize the batch-size superlinearity.

Run:  python scripts/step_ablation.py [quick]
"""
import sys
import time

import numpy as np


def sync(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, 'ravel')][0]
    float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def timeit(fn, *args, n=8, label=''):
    r = fn(*args)
    sync(r)
    for _ in range(2):
        r = fn(*args)
        sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        sync(r)          # drain every step (relay flow-control pathology)
    dt = (time.time() - t0) / n * 1000
    print(f'  {label:44s} {dt:9.2f} ms', flush=True)
    return dt


def probe(chs, bs, n=8, parts=('full', 'fwdbwd', 'fwd', 'gather', 'adam')):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import (DevicePipeline, gather_augment,
                                        window_size)
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import (init_state, make_train_step,
                                     compute_loss, prepare_targets)

    print(f'--- chs={chs} bs={bs} ---', flush=True)
    cfg = Config(train_trainset='/tmp/mmlf_bench_data', train_bs=bs,
                 train_ps=96, train_lr=1e-3, train_shift=0.0,
                 model_uncert=True, train_warm_start=True, bf16=True,
                 cache_bf16=True, model_chs=chs).finalize()
    dataset = HCI4D(cfg.train_trainset, cache=True, length=4096)
    pipe = DevicePipeline(dataset, cfg, seed=0)
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 96, 96, 3))] * 4)

    if 'full' in parts:
        step = make_train_step(cfg, model, tx, use_cache=True)
        db = pipe.sample_batch(bs)
        st = [state]

        def full(db):
            st[0], loss = step(st[0], db, pipe.cache)
            return loss
        dt = timeit(full, db, n=n, label='full step')
        print(f'  {"":44s} {bs / dt * 1000:9.1f} patches/s', flush=True)
        state = st[0]

    # fixed input windows for the isolated parts
    db = pipe.sample_batch(bs)
    h, v, i, d, gt, mpi, mask = jax.jit(
        lambda c, b: gather_augment(c, b, cfg.train_ps,
                                    window_size(cfg.train_ps),
                                    with_mpi=False))(pipe.cache, db)
    (h, v, i, d, gt, mask) = jax.device_get((h, v, i, d, gt, mask))
    h, v, i, d = (jnp.asarray(x) for x in (h, v, i, d))
    gt, mask = jnp.asarray(gt), jnp.asarray(mask)

    def loss_fn(params, stats, h, v, i, d, gt, mask):
        g2, mpi2, gtc, m2, mp = prepare_targets(cfg, gt, None, mask)
        out, mut = model.apply({'params': params, 'batch_stats': stats},
                               h, v, i, d, train=True,
                               mutable=['batch_stats'])
        return compute_loss(cfg, out, g2, mpi2, gtc, m2, mp)

    if 'fwdbwd' in parts:
        gfn = jax.jit(jax.value_and_grad(loss_fn))
        timeit(lambda *a: gfn(*a)[0], state.params, state.batch_stats,
               h, v, i, d, gt, mask, n=n, label='fwd+bwd (fixed windows)')
    if 'fwd' in parts:
        ffn = jax.jit(loss_fn)
        timeit(ffn, state.params, state.batch_stats, h, v, i, d, gt, mask,
               n=n, label='fwd only')
    if 'gather' in parts:
        # parity=True matches the train step (DevicePipeline batches are
        # rotation-stratified)
        gat = jax.jit(lambda c, b: gather_augment(
            c, b, cfg.train_ps, window_size(cfg.train_ps), with_mpi=False,
            parity=True))
        timeit(gat, pipe.cache, db, n=n, label='gather+augment only')
    if 'adam' in parts:
        _, grads = jax.jit(jax.value_and_grad(loss_fn))(
            state.params, state.batch_stats, h, v, i, d, gt, mask)
        sync(grads)

        def adam(grads, opt_state, params):
            upd, no = tx.update(grads, opt_state, params)
            return optax.apply_updates(
                params, jax.tree_util.tree_map(lambda u: -1e-3 * u, upd))
        afn = jax.jit(adam)
        timeit(afn, grads, state.opt_state, state.params, n=n,
               label='adam update only')


def main():
    import jax
    print(f'device: {jax.devices()[0]}', flush=True)
    quick = len(sys.argv) > 1 and sys.argv[1] == 'quick'

    probe(70, 64)
    probe(70, 128)
    if not quick:
        probe(64, 128)
        # batch-scaling sweep at the reference-exact width too (out_net MXU
        # efficiency rises with batch: 100 -> 150 TF/s going B=64 -> 128)
        for bs in (192, 256):
            probe(70, bs, n=6, parts=('full',))
        for bs in (64, 192, 256):
            probe(64, bs, n=6, parts=('full',))


if __name__ == '__main__':
    main()
