"""Benchmark: training throughput (patches/sec/chip) of the flagship model.

Measures the steady-state fused train step (on-device augmentation + forward
+ backward + Adam in one XLA program) for the full-size UPR configuration
(chs=70, 3+8 blocks, ps=96 — the reference's README recipe) on one TPU chip,
host input pipeline included (it overlaps with device compute via async
dispatch).

Prints ONE JSON line:
  {"metric": "train_patches_per_sec_per_chip", "value": N,
   "unit": "patches/s", "vs_baseline": R}

``vs_baseline`` normalizes against an ESTIMATED single-A100 throughput of
the reference recipe (the reference publishes no numbers — BASELINE.md):
~230 patches/s/GPU, from ~270 GFLOP/patch (fwd+bwd, 96² patch, 70ch/280ch
conv trunk) at ~40% TF32 utilization on an A100 (8 GPUs ≈ 1850 patches/s).
The >2x-node target of BASELINE.json then corresponds to
vs_baseline >= 2 per chip.
"""

import json
import os
import sys
import time

import numpy as np

A100_PATCHES_PER_SEC_EST = 230.0

BENCH_DATA = '/tmp/mmlf_bench_data'
SCENE_SIZE = 512
BATCH = 64
WARMUP = 3
MEASURE = 20


def ensure_data():
    marker = os.path.join(BENCH_DATA, 'scene_01', 'gt_disp_lowres.pfm')
    if not os.path.exists(marker):
        from mmlf_tpu.data.synth import generate_dataset
        print('generating bench scenes...', file=sys.stderr)
        generate_dataset(BENCH_DATA, scenes=2, size=SCENE_SIZE, seed=0)
    return BENCH_DATA


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import init_state, make_train_step

    data = ensure_data()
    dev = jax.devices()[0]
    print(f'device: {dev}', file=sys.stderr)

    cfg = Config(
        train_trainset=data, train_bs=BATCH, train_ps=96, train_lr=1e-3,
        train_shift=0.0, model_uncert=True, train_warm_start=True,
        bf16=True,
    ).finalize()

    # device-resident pipeline: scenes live in HBM, batches are index-only
    dataset = HCI4D(data, cache=True, length=4096)
    pipe = DevicePipeline(dataset, cfg, seed=0)

    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    dummy = [jnp.zeros((1, 9, cfg.train_ps, cfg.train_ps, 3))] * 4
    state = init_state(cfg, model, tx, dummy)
    step = make_train_step(cfg, model, tx, use_cache=True)

    print('compiling train step...', file=sys.stderr)
    t0 = time.time()
    state, loss = step(state, pipe.sample_batch(BATCH), pipe.cache)
    loss.block_until_ready()
    print(f'compile+first step: {time.time() - t0:.1f}s', file=sys.stderr)

    for _ in range(WARMUP):
        state, loss = step(state, pipe.sample_batch(BATCH), pipe.cache)
        float(loss)   # keep the relay queue drained (see measured loop)

    # measured loop with a host readback EVERY step: on the tunneled axon
    # backend block_until_ready can return early and deep async queues show
    # multi-second variance — per-step sync costs one ~32 ms RTT but gives
    # stable, conservative numbers
    t0 = time.time()
    for k in range(MEASURE):
        state, loss = step(state, pipe.sample_batch(BATCH), pipe.cache)
        float(loss)
    dt = time.time() - t0

    patches_per_sec = BATCH * MEASURE / dt
    print(f'steady step (sync each): {dt / MEASURE * 1000:.1f} ms '
          f'(loss {float(loss):.4f})', file=sys.stderr)

    print(json.dumps({
        'metric': 'train_patches_per_sec_per_chip',
        'value': round(patches_per_sec, 1),
        'unit': 'patches/s',
        'vs_baseline': round(patches_per_sec / A100_PATCHES_PER_SEC_EST, 3),
    }))


if __name__ == '__main__':
    main()
