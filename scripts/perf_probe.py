"""Round-2 perf probe: break the 332 ms train step into components.

Measures (on the real chip):
  1. full train step (reproduce r1 baseline)
  2. fwd-only (train BN), fwd-only eval BN, bf16 vs fp32
  3. fwd+bwd without gather/augment
  4. raw k=2 conv-block throughput at chs (70/280), (64/256), (128/512)
     with/without BN, bf16 vs fp32 — the MXU/HBM roofline check
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from mmlf_tpu.config import Config
from mmlf_tpu.data.hci4d import HCI4D
from mmlf_tpu.data.pipeline import DevicePipeline, gather_windows, window_size, augment_batch
from mmlf_tpu.models import FeedForward
from mmlf_tpu.train.loop import init_state, make_train_step, prepare_targets, compute_loss

BATCH = 64
PS = 96

def sync(r):
    # axon relay: block_until_ready can return early; force a host readback
    leaves = [x for x in jax.tree_util.tree_leaves(r)
              if hasattr(x, 'ravel')]
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[:1]))

def timeit(fn, *args, n=10, warmup=2, name=''):
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / n * 1000
    print(f'{name:55s} {dt:8.1f} ms', flush=True)
    return dt

def main():
    data = '/tmp/mmlf_bench_data'
    import os
    if not os.path.exists(os.path.join(data, 'scene_01')):
        from mmlf_tpu.data.synth import generate_dataset
        generate_dataset(data, scenes=2, size=512, seed=0)

    cfg = Config(train_trainset=data, train_bs=BATCH, train_ps=PS,
                 train_lr=1e-3, train_shift=0.0, model_uncert=True,
                 train_warm_start=True, bf16=True).finalize()
    dataset = HCI4D(data, cache=True, length=4096)
    pipe = DevicePipeline(dataset, cfg, seed=0)

    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    dummy = [jnp.zeros((1, 9, PS, PS, 3))] * 4
    state = init_state(cfg, model, tx, dummy)
    step = make_train_step(cfg, model, tx, use_cache=True)

    db = pipe.sample_batch(BATCH)

    # 1. full step
    s2, loss = step(state, db, pipe.cache)
    jax.block_until_ready(loss)
    del s2
    # need fresh state each call since donated; measure via loop re-threading
    def full_loop():
        st = state
        st, l = step(st, db, pipe.cache)
        float(l)
        t0 = time.time()
        N = 10
        for _ in range(N):
            st, l = step(st, db, pipe.cache)
        float(l)
        return (time.time() - t0) / N * 1000
    state = init_state(cfg, model, tx, dummy)
    _ = full_loop()
    state = init_state(cfg, model, tx, dummy)
    print(f'{"full train step (chained, no per-step sync)":55s} {full_loop():8.1f} ms', flush=True)
    state = init_state(cfg, model, tx, dummy)

    # 2. gather+augment alone
    @jax.jit
    def ga(db, cache):
        b = gather_windows(cache, db, window_size(PS))
        return augment_batch(b, PS)
    timeit(ga, db, pipe.cache, name='gather + augment')

    stacks = ga(db, pipe.cache)
    h, v, i, d, gt, mpi, mask = [jax.device_put(x) for x in stacks]
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    # 3. fwd only
    @jax.jit
    def fwd_train(variables, h, v, i, d):
        out, _ = model.apply(variables, h, v, i, d, train=True,
                             mutable=['batch_stats'])
        return out['mean']
    timeit(fwd_train, variables, h, v, i, d, name='fwd only (BN train) bf16')

    @jax.jit
    def fwd_eval(variables, h, v, i, d):
        return model.apply(variables, h, v, i, d, train=False)['mean']
    timeit(fwd_eval, variables, h, v, i, d, name='fwd only (BN eval) bf16')

    # fp32 variant
    model32 = model.clone(dtype=jnp.float32)
    @jax.jit
    def fwd32(variables, h, v, i, d):
        out, _ = model32.apply(variables, h, v, i, d, train=True,
                               mutable=['batch_stats'])
        return out['mean']
    timeit(fwd32, variables, h, v, i, d, name='fwd only (BN train) fp32')

    # no-BN variant
    modelnb = model.clone(no_batchnorm=True)
    vnb = modelnb.init(jax.random.PRNGKey(0), *[x[:1] for x in (h, v, i, d)])
    @jax.jit
    def fwdnb(variables, h, v, i, d):
        return modelnb.apply(variables, h, v, i, d, train=True)['mean']
    timeit(fwdnb, vnb, h, v, i, d, name='fwd only no-BN bf16')

    # 4. fwd+bwd without gather/augment
    gt2, mpi2, gt_classes, mask2, mask_padding = jax.jit(
        lambda gt, mpi, mask: prepare_targets(cfg, gt, mpi, mask))(gt, mpi, mask)

    def loss_fn(params, bs):
        out, mut = model.apply({'params': params, 'batch_stats': bs},
                               h, v, i, d, train=True,
                               mutable=['batch_stats'])
        return compute_loss(cfg, out, gt2, mpi2, gt_classes, mask2,
                            mask_padding), mut['batch_stats']
    grad_fn = jax.jit(lambda p, bs: jax.value_and_grad(
        loss_fn, has_aux=True)(p, bs))
    timeit(grad_fn, state.params, state.batch_stats,
           name='fwd+bwd (no gather/augment) bf16')

    # 5. raw conv-block roofline: out_net-like stack
    def conv_stack_time(chs, dtype, n_blocks=8, bn=False, pet=None):
        x0 = jnp.ones((BATCH, PS, PS, chs), dtype)
        k1 = jnp.ones((2, 2, chs, chs), dtype) * 0.01
        def f(x):
            for _ in range(n_blocks * 2):
                x = jax.lax.conv_general_dilated(
                    x, k1, (1, 1), [(1, 0), (1, 0)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=pet)
                x = jax.nn.relu(x)
            return x
        jf = jax.jit(f)
        dt = timeit(jf, x0, name=f'  conv x{n_blocks*2} chs={chs} {dtype.__name__} pet={pet and pet.__name__}')
        flops = n_blocks * 2 * BATCH * PS * PS * 4 * chs * chs * 2
        print(f'    -> {flops / dt * 1e-9:8.1f} TFLOP/s effective', flush=True)

    for chs in (280, 256, 512, 128):
        conv_stack_time(chs, jnp.bfloat16)
    conv_stack_time(280, jnp.float32)
    conv_stack_time(280, jnp.bfloat16, pet=jnp.float32)

if __name__ == '__main__':
    main()
