"""Quantify the gradient-accumulation averaging deviation (VERDICT r3
item 7 / weak #4).

The accum scan averages per-chunk masked-mean losses/grads uniformly
(train/loop.py), which equals the true global-batch masked mean only when
per-chunk mask counts match.  The README recipe has no --train_loss_padding,
but the dataset mask (mask.png ∧ texture mask) varies per window, so chunk
counts CAN differ.  This probe measures, on the parity dataset at the
bs=512/accum=8 recipe:

  * per-chunk mask-count spread,
  * |loss_unweighted - loss_exact| / |loss_exact|,
  * relative L2 and cosine distance between the unweighted-mean gradient
    (what training uses) and the exact count-weighted gradient,

for both recipe losses whose masked-mean structure makes the
count-weighted combination EXACT: UPR (improved_uncertainty_l1 without
padding reduces to one masked mean) and DPP multimodal
(masked_cross_entropy).  (--train_loss_padding introduces a second
renormalized mask whose global combination is not a single count
weighting; it is outside the README recipe and keeps its documented
caveat at train/loop.py.)

Exactness identity: with S_c = sum(loss·mask) and N_c = sum(mask) per
chunk, the true global mean is Σ S_c / Σ N_c = Σ (N_c/ΣN)·(S_c/N_c), i.e.
the count-weighted mean of the chunk means; same for its gradient.

Run:  python scripts/accum_mean_probe.py [DATA_DIR]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def probe(data, head='upr', batches=4, chs=70, bs=512, accum=8,
          punch_mask=False):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import (DevicePipeline, gather_augment,
                                        window_size)
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import (compute_loss, init_state,
                                     prepare_targets)

    kw = (dict(model_uncert=True) if head == 'upr'
          else dict(model_discrete=True, train_loss_multimodal=True))
    cfg = Config(train_trainset=data, train_bs=bs, train_ps=96,
                 train_lr=1e-3, train_shift=2.5,
                 train_warm_start=True, bf16=True, cache_bf16=True,
                 model_chs=chs, train_accum=accum, **kw).finalize()
    dataset = HCI4D(cfg.train_trainset, cache=True, length=4096)
    if punch_mask:
        # force strong per-window mask-count variation (a worst case the
        # fully-textured parity scenes may not exhibit): invalidate a
        # diagonal half of every scene's mask
        rng = np.random.default_rng(0)
        for dd in dataset.data:
            m = dd[7]
            yy, xx = np.mgrid[:m.shape[0], :m.shape[1]]
            m *= ((yy + xx + rng.integers(0, m.shape[1]))
                  % (2 * m.shape[1]) < m.shape[1]).astype(m.dtype)
    pipe = DevicePipeline(dataset, cfg, seed=0)
    model = FeedForward.from_config(cfg)
    state = init_state(cfg, model, optax.scale_by_adam(),
                       [jnp.zeros((1, 9, 96, 96, 3))] * 4)

    def chunk_loss(params, stats, chunk, cache):
        h, v, i, d, gt, mpi, mask = gather_augment(
            cache, chunk, cfg.train_ps, window_size(cfg.train_ps),
            with_mpi=(head != 'upr'), parity=True, fold=True)
        gt, mpi, gtc, mask, mp = prepare_targets(cfg, gt, mpi, mask)
        out, _ = model.apply({'params': params, 'batch_stats': stats},
                             h, v, i, d, train=True, folded=True,
                             mutable=['batch_stats'])
        loss = compute_loss(cfg, out, gt, mpi, gtc, mask, mp)
        # both recipe losses normalize by sum(mask) (losses._masked_mean)
        count = jnp.sum(mask.astype(jnp.float32))
        return loss, count

    gfn = jax.jit(jax.value_and_grad(chunk_loss, has_aux=True))

    rows = []
    for b in range(batches):
        db = pipe.sample_batch(bs)
        chunks = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, -1) + x.shape[1:]), db)
        losses, counts, grads = [], [], []
        for c in range(accum):
            chunk = jax.tree_util.tree_map(lambda x: x[c], chunks)
            (loss, count), g = gfn(state.params, state.batch_stats,
                                   chunk, pipe.cache)
            losses.append(float(loss))
            counts.append(float(count))
            grads.append(jax.tree_util.tree_map(np.asarray, g))
        losses, counts = np.array(losses), np.array(counts)
        w = counts / counts.sum()

        flat = [np.concatenate([x.ravel() for x in
                                jax.tree_util.tree_leaves(g)]).astype('f8')
                for g in grads]
        g_uni = np.mean(flat, axis=0)
        g_wtd = np.sum([wi * f for wi, f in zip(w, flat)], axis=0)

        l_uni, l_wtd = losses.mean(), float((losses * w).sum())
        rel_loss = abs(l_uni - l_wtd) / max(abs(l_wtd), 1e-12)
        rel_g = np.linalg.norm(g_uni - g_wtd) / max(
            np.linalg.norm(g_wtd), 1e-12)
        cos = float(g_uni @ g_wtd / max(np.linalg.norm(g_uni)
                                        * np.linalg.norm(g_wtd), 1e-12))
        spread = (counts.max() - counts.min()) / counts.mean()
        rows.append((spread, rel_loss, rel_g, cos))
        print(f'  batch {b}: count spread {spread:.2e} '
              f'(min {counts.min():.0f} max {counts.max():.0f}), '
              f'|Δloss|/|loss| {rel_loss:.2e}, relL2(grad) {rel_g:.2e}, '
              f'cos {cos:.8f}', flush=True)
    rows = np.array(rows)
    print(f'  mean over {batches} batches: spread {rows[:, 0].mean():.2e} '
          f'rel_loss {rows[:, 1].mean():.2e} rel_grad {rows[:, 2].mean():.2e}',
          flush=True)


def main():
    import jax
    data = sys.argv[1] if len(sys.argv) > 1 else '/tmp/parity/data/train'
    print(f'device: {jax.devices()[0]}', flush=True)
    print('=== UPR README recipe (count variation from the dataset/'
          'texture mask) ===', flush=True)
    probe(data, head='upr')
    print('=== DPP multimodal recipe ===', flush=True)
    probe(data, head='dpp')
    print('=== forced worst case: half of every scene mask invalidated '
          '===', flush=True)
    probe(data, head='upr', punch_mask=True)


if __name__ == '__main__':
    main()
