"""bs=512 README-recipe step bench (VERDICT r2 item 2).

Measures the fused accumulation step (the reference README's bs=512 on one
chip as ``--train_accum`` microbatches) with the round-3 input path
(parity-stratified rotations + folded model-layout augment output).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench512.py
"""
import sys
import time

import numpy as np


def measure(chs, accum, n=6):
    import jax
    import jax.numpy as jnp
    import optax

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import init_state, make_train_step

    bs = 512
    cfg = Config(train_trainset='/tmp/mmlf_bench_data', train_bs=bs,
                 train_ps=96, train_lr=1e-3, train_shift=0.0,
                 model_uncert=True, train_warm_start=True, bf16=True,
                 cache_bf16=True, model_chs=chs,
                 train_accum=accum).finalize()
    dataset = HCI4D(cfg.train_trainset, cache=True, length=4096)
    pipe = DevicePipeline(dataset, cfg, seed=0)
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 96, 96, 3))] * 4)
    step = make_train_step(cfg, model, tx, use_cache=True)

    db = pipe.sample_batch(bs)
    t0 = time.time()
    state, loss = step(state, db, pipe.cache)
    print(f'[chs={chs} bs=512 accum={accum}] compile+first: '
          f'{time.time() - t0:.1f}s (loss {float(loss):.4f})', flush=True)
    for _ in range(2):
        state, loss = step(state, pipe.sample_batch(bs), pipe.cache)
        float(loss)
    t0 = time.time()
    for _ in range(n):
        state, loss = step(state, pipe.sample_batch(bs), pipe.cache)
    float(loss)
    dt_async = (time.time() - t0) / n
    t0 = time.time()
    for _ in range(n):
        state, loss = step(state, pipe.sample_batch(bs), pipe.cache)
        float(loss)
    dt_sync = (time.time() - t0) / n
    print(f'[chs={chs} bs=512 accum={accum}] step '
          f'{dt_async * 1000:.1f} ms async / {dt_sync * 1000:.1f} sync '
          f'({bs / dt_async:.1f} / {bs / dt_sync:.1f} patches/s)',
          flush=True)


def main():
    import jax
    print(f'device: {jax.devices()[0]}', flush=True)
    for chs, accum in ((70, 4), (64, 4), (70, 8)):
        measure(chs, accum)


if __name__ == '__main__':
    main()
