"""Training loop: jitted augment+forward+backward step, schedules, validation.

Reference behaviour being reproduced (mmlf/train/cli.py:185-336):
  * infinite step loop over a virtual-length-4096 shuffled dataset;
  * margin-11 train mask on top of the dataset mask (:194);
  * strongest-mode GT via MPI-alpha argmax when ``--train_loss_strongest``;
  * discrete targets via ``reg_to_class`` / ``mpi_to_weights`` (:201-207);
  * loss-padding masks (:218-222);
  * warm-start LR ramp (i ≤ 1000 → lr·i/1000) and cooling decay
    (i ≥ cool → lr/10^(i/cool − 1)) (:233-241);
  * head-dependent loss selection (:247-255);
  * periodic validation at full scene resolution with margin-15 masks,
    MSE + BadPix(0.07), artifact dump, rolling checkpoint (:267-329);
  * fixed-width CSV log with the reference's exact columns (:172,331).

TPU-first differences: the whole augment→forward→loss→grad→Adam step is ONE
jitted XLA program over a ``data``-mesh-sharded batch (gradient psum over ICI
inserted by XLA); the LR schedule is computed inside the step from the step
counter, so resume needs no optimizer-LR surgery.
"""

from __future__ import annotations

import collections
import os
import signal
import sys
import threading
import time

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..data.hci4d import HCI4D
from ..data.pipeline import (DevicePipeline, TrainPipeline, augment_batch,
                             gather_augment, window_size)
from ..losses import (improved_multi_uncertainty_l1, improved_uncertainty_l1,
                      information_bottleneck, masked_badpix,
                      masked_cross_entropy, masked_l1, masked_mse,
                      multi_masked_l1)
from ..models import FeedForward
from ..models.ensemble import ensemble_forward
from ..models.invertible import NOT_SUPPORTED_MSG
from ..ops.codecs import mpi_to_weights, reg_to_class
from ..ops.masks import create_mask_margin
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .checkpoint import (ModelSaver, has_checkpoint, load_checkpoint_raw,
                         restore_from_raw)

LOG_HEADER = (f'{"iter":>7}, loss_train,   loss_val,        mse, '
              'badpix_007, time_elapsed')


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(cfg: Config, step):
    """Warm-start ramp + cooling decay (reference mmlf/train/cli.py:233-241)."""
    step = step.astype(jnp.float32)
    lr = jnp.float32(cfg.train_lr)
    if cfg.train_warm_start:
        lr = jnp.where(step <= 1000.0, cfg.train_lr * step / 1000.0, lr)
    if cfg.train_cooling > 0:
        cool = float(cfg.train_cooling)
        cooled = cfg.train_lr / 10.0 ** (step / cool - 1.0)
        lr = jnp.where(step >= cool, cooled, lr)
    return lr


def compute_loss(cfg: Config, output, gt, mpi, gt_classes, mask,
                 mask_padding, step=None):
    """Head-dependent training loss (reference mmlf/train/cli.py:247-255).

    ``--train_logvar_warmup N`` (TPU extension, default off) scales the
    logvar the uncertainty losses see by ``min(step/N, 1)``: at step 0 the
    UPR loss is exactly masked L1 (``exp(0)·|err| + 0``), reaching the
    reference loss at step N.  This breaks the seed-dependent collapse
    where a badly-initialized logvar head blows up ``exp(-logvar)`` and
    training settles in a high-uncertainty optimum (docs/STATUS.md).
    """
    anchor = 0.0
    if cfg.model_uncert and cfg.train_logvar_anchor > 0:
        # calibration anchor on the TRUE logvar (before any warmup
        # scaling): the head being calibrated is the one ESE selects on
        from ..losses import logvar_anchor
        anchor = cfg.train_logvar_anchor * logvar_anchor(
            output, gt, mpi, mask, mask_padding,
            multimodal=cfg.train_loss_multimodal)
    if (cfg.model_uncert and cfg.train_logvar_warmup > 0
            and step is not None):
        w = jnp.minimum(step.astype(jnp.float32)
                        / float(cfg.train_logvar_warmup), 1.0)
        output = dict(output, logvar=output['logvar'] * w)
    if cfg.model_inn:
        # working INN path (beyond reference — models/inn.py); the IB loss
        # ignores the mask like the reference's (loss.py:389)
        return information_bottleneck(output, gt_classes, cfg.train_beta)
    if cfg.model_uncert:
        if cfg.train_loss_multimodal:
            return anchor + improved_multi_uncertainty_l1(output, mpi, mask,
                                                          mask_padding)
        return anchor + improved_uncertainty_l1(output, gt, mask,
                                                mask_padding)
    if cfg.model_discrete:
        return masked_cross_entropy(output, gt_classes, mask)
    if cfg.model_invertible:
        raise NotImplementedError(NOT_SUPPORTED_MSG)
    if cfg.train_loss_multimodal:
        return multi_masked_l1(output, mpi, mask)
    return masked_l1(output, gt, mask)


def prepare_targets(cfg: Config, gt, mpi, mask):
    """Target/mask preparation (reference mmlf/train/cli.py:190-222)."""
    if cfg.train_loss_strongest:
        inds = jnp.argmax(mpi[..., 3], axis=1)               # (b, P, P)
        gt = jnp.take_along_axis(mpi[..., 4], inds[:, None], axis=1)[:, 0]

    margin = create_mask_margin(mask.shape[-2:], 11)
    mask = mask.astype(jnp.int32) * margin.astype(jnp.int32)

    gt_classes = None
    if cfg.model_discrete or cfg.model_inn:
        if cfg.train_loss_multimodal and not cfg.model_inn:
            gt_classes = mpi_to_weights(mpi, cfg.val_disp_min,
                                        cfg.val_disp_max, cfg.steps)
        else:
            # INN cluster count == cfg.steps (models/inn.py dims)
            gt_classes = reg_to_class(gt, cfg.val_disp_min,
                                      cfg.val_disp_max, cfg.steps)

    mask_padding = None
    if cfg.train_loss_padding is not None:
        pad = float(cfg.train_loss_padding)
        if cfg.train_loss_multimodal:
            keep = (jnp.abs(mpi[..., 4]) < pad).astype(jnp.float32)
            mpi = mpi.at[..., 3].multiply(keep)
        else:
            mask_padding = (jnp.abs(gt) < pad).astype(jnp.int32)

    return gt, mpi, gt_classes, mask, mask_padding


def make_train_step(cfg: Config, model: FeedForward, tx,
                    bn_train: bool = True, use_cache: bool = False,
                    mesh=None):
    """Build the jitted train step (augment + fwd + bwd + Adam in one XLA
    program).  ``bn_train=False`` gives the ``--train_eval_mode`` variant
    (BN uses running stats, no stat updates).

    With ``use_cache=True`` the incoming batch is index-only
    (``DeviceBatch``) and window extraction happens in-step as a gather
    from HBM — the TPU-native input path.  The cache is threaded through as
    a jit ARGUMENT (``step(state, batch, cache)``): closing over it would
    embed gigabytes of scene data as constants in the HLO (which a
    remote-compile service may reject outright).
    """

    # MPI windows are only materialized when a loss actually reads them
    with_mpi = bool(cfg.train_loss_multimodal or cfg.train_loss_strongest)
    accum = max(1, int(getattr(cfg, 'train_accum', 1)))
    # DevicePipeline stratifies rotations (even k first half / odd second,
    # per accum chunk) so the rotation transpose is one static half-batch
    # op; without augmentation rot_k is all-zero and the contract is off
    parity = not cfg.train_no_data_augment
    # the fused input path emits stacks pre-folded to the model layout
    # (b, ps, ps, n*3) — no 3-minor-dim relayout passes (augment2 fold);
    # the INN folds its streams itself and keeps the stack layout
    fold = not cfg.model_inn

    def microbatch_grads(state: TrainState, batch, cache):
        mkw = {'folded': True} if (use_cache and fold) else {}
        if use_cache:
            h, v, i, d, gt, mpi, mask = gather_augment(
                cache, batch, cfg.train_ps, window_size(cfg.train_ps),
                with_mpi=with_mpi, mesh=mesh, parity=parity, fold=fold)
        else:
            h, v, i, d, gt, mpi, mask = augment_batch(batch, cfg.train_ps)
        gt, mpi, gt_classes, mask, mask_padding = prepare_targets(
            cfg, gt, mpi, mask)

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            if bn_train and not cfg.model_no_batchnorm:
                output, mutated = model.apply(
                    variables, h, v, i, d, train=True,
                    mutable=['batch_stats'], **mkw)
                new_stats = mutated['batch_stats']
            else:
                output = model.apply(variables, h, v, i, d, train=False,
                                     **mkw)
                new_stats = state.batch_stats
            loss = compute_loss(cfg, output, gt, mpi, gt_classes, mask,
                                mask_padding, step=state.step)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # valid-pixel count of this microbatch's mask — the normalizer of
        # every (non-padding) recipe loss; consumed by train_accum_exact
        count = jnp.sum(mask).astype(jnp.float32)
        return loss, new_stats, grads, count

    exact = bool(getattr(cfg, 'train_accum_exact', False)) and accum > 1
    if exact:
        # the count-weighted combination is exact only when every loss
        # term normalizes by the SAME mask count (docs/STATUS round 5)
        if cfg.train_loss_padding is not None:
            raise ValueError(
                '--train_accum_exact is incompatible with '
                '--train_loss_padding: the in/out-of-range two-term loss '
                'has no single mask count')
        if cfg.model_inn:
            raise ValueError(
                '--train_accum_exact does not apply to the INN: its IB '
                'loss ignores the mask, and equal-sized chunks make the '
                'default uniform averaging already exact')
        if (cfg.model_uncert and cfg.train_logvar_anchor > 0
                and cfg.train_loss_multimodal):
            raise ValueError(
                '--train_accum_exact with a multimodal logvar anchor is '
                'unsupported: the anchor normalizes over mask∧in-range, '
                'a different count than the main loss')

    def step_fn(state: TrainState, batch, cache=None):
        if accum == 1:
            loss, new_stats, grads, _ = microbatch_grads(state, batch,
                                                         cache)
        else:
            # gradient accumulation: global batch as `accum` sequential
            # microbatches in ONE program (lax.scan) — this is how the
            # reference's bs=512 README recipe fits one chip.  Default:
            # chunk losses/grads are averaged uniformly — exact when
            # per-chunk mask counts match, which the README recipe
            # MEASURES as exactly true on the parity dataset (deviation
            # 0.0; adversarially unequal masks reach rel-grad 0.17 with
            # cos >= 0.985 — scripts/accum_mean_probe.py, STATUS round 5).
            # --train_accum_exact weights chunks by their mask counts:
            # sum_c N_c (S_c/N_c) / sum_c N_c == the ONE global masked
            # mean the reference computes over the full gathered batch.
            # BatchNorm batch stats come from chunk 0 either way, matching
            # torch DataParallel where only replica 0's (microbatch-sized)
            # buffer updates survive.
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, -1) + x.shape[1:]), batch)

            def body(carry, xs):
                chunk, idx = xs
                loss_c, stats_c, grads_c, n_c = microbatch_grads(
                    state, chunk, cache)
                loss_a, stats_a, grads_a, n_a = carry
                stats_a = jax.tree_util.tree_map(
                    lambda a, c: jnp.where(idx == 0, c, a),
                    stats_a, stats_c)
                w = n_c if exact else jnp.float32(1.0 / accum)
                grads_a = jax.tree_util.tree_map(
                    lambda a, c: a + w * c, grads_a, grads_c)
                return (loss_a + w * loss_c, stats_a, grads_a,
                        n_a + n_c), None

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            init = (jnp.float32(0.0), state.batch_stats, zeros_g,
                    jnp.float32(0.0))
            (loss, new_stats, grads, n_total), _ = jax.lax.scan(
                body, init, (chunks, jnp.arange(accum)))
            if exact:
                norm = jnp.maximum(n_total, 1.0)
                loss = loss / norm
                grads = jax.tree_util.tree_map(lambda g: g / norm, grads)

        lr = lr_schedule(cfg, state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    return jax.jit(step_fn, donate_argnums=(0,))


def make_val_forward(cfg: Config, model: FeedForward):
    """Full-scene eval forward + metrics as ONE jitted program per shape.

    (Eager per-metric ops would each pay a dispatch/compile round trip on a
    remote TPU backend.)  Returns ``(output, loss_val, mse, badpix)``.
    """
    apply_fn = lambda variables, *stacks: model.apply(variables, *stacks)

    def fwd(variables, h, v, i, d, gt, mpi):
        if cfg.val_ensamble:
            output = ensemble_forward(apply_fn, variables, h, v, i, d,
                                      cfg.val_disp_min, cfg.val_disp_max,
                                      cfg.val_disp_step)
        else:
            output = apply_fn(variables, h, v, i, d)
        mask = create_mask_margin(gt.shape, cfg.val_loss_margin)
        lv = val_loss(cfg, output, gt, mpi, mask)
        return (output, lv, masked_mse(output, gt, mask),
                masked_badpix(output, gt, mask))

    return jax.jit(fwd)


def val_loss(cfg: Config, output, gt, mpi, mask):
    """Validation loss selection (reference mmlf/train/cli.py:289-298)."""
    if cfg.model_inn:
        target = reg_to_class(gt, cfg.val_disp_min, cfg.val_disp_max,
                              cfg.steps)
        return information_bottleneck(output, target, cfg.train_beta)
    if cfg.model_uncert:
        if cfg.train_loss_multimodal:
            return improved_multi_uncertainty_l1(output, mpi, mask)
        return improved_uncertainty_l1(output, gt, mask)
    if cfg.train_loss_multimodal:
        return multi_masked_l1(output, mpi, mask)
    return masked_l1(output, gt, mask)


def init_state(cfg: Config, model: FeedForward, tx,
               sample_stacks) -> TrainState:
    variables = model.init(jax.random.PRNGKey(cfg.train_seed),
                           *sample_stacks)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def train(cfg: Config, output_dir: str,
          progress: bool = True) -> TrainState:
    """Run the training loop.  Returns the final state.

    ``cfg.train_steps > 0`` bounds the loop (tests/bench); 0 runs forever
    like the reference.
    """
    assert not (cfg.train_loss_strongest and cfg.train_loss_multimodal)
    if cfg.model_invertible:
        raise NotImplementedError(NOT_SUPPORTED_MSG)

    # a resumed run must NOT replay the sample/augmentation stream of
    # steps 0..N (the reference's DataLoader also reshuffles freshly on
    # restart) — derive a fresh deterministic seed from (train_seed,
    # iteration).  SeedSequence-mixed rather than additive so a resumed
    # seed-11 run never collides with an independent seed-13 run.  The
    # checkpoint is decoded ONCE here and reused for the state restore
    # below (it can be GBs of params + Adam moments).
    resume_raw = None
    resume_i = 0
    if cfg.train_resume and has_checkpoint(output_dir):
        resume_raw, _meta0, _ = load_checkpoint_raw(output_dir)
        resume_i = int(_meta0['iteration'])
        resume_raw['__meta__'] = _meta0
    rng_seed = cfg.train_seed if resume_i == 0 else int(
        np.random.SeedSequence([cfg.train_seed, resume_i])
        .generate_state(1)[0])

    # the host-pipeline transform chain draws from the stdlib/np global
    # RNGs (reference-faithful); pin them so --train_seed reproduces runs
    # (the device pipelines use their own seeded np.Generator)
    import random
    random.seed(rng_seed)
    np.random.seed(rng_seed)

    trainset = HCI4D(cfg.train_trainset, cache=True, length=4096)

    # data-parallel mesh over the requested (--mesh_data, default: all
    # local) devices, when the batch divides the MESH size
    ndev = len(jax.devices())
    mesh_n = cfg.mesh_data if cfg.mesh_data else ndev
    use_mesh = 1 < mesh_n <= ndev and cfg.train_bs % mesh_n == 0
    mesh = make_mesh(mesh_n) if use_mesh else None
    if mesh is None and mesh_n > 1:
        # a degraded-but-running fallback must be LOUD: an unnoticed
        # single-device run on an N-device host burns N× step time
        why = (f'mesh size {mesh_n} exceeds the {ndev} local device(s)'
               if mesh_n > ndev else
               f'batch size {cfg.train_bs} does not divide over {mesh_n} '
               f'devices')
        print(f'WARNING: data-parallel mesh disabled ({why}); training '
              f'single-device', file=sys.stderr)

    # prefer the device-resident pipeline (scenes in HBM, index-only
    # batches) unless forced off or the cache would not fit
    scene_bytes = sum(
        sum(a.nbytes for a in (d[0], d[1], d[2], d[3], d[5], d[6], d[7]))
        for d in trainset.data)
    use_device_cache = (not cfg.host_pipeline) and scene_bytes < 8 << 30
    shapes_uniform = len({d[5].shape for d in trainset.data}) == 1
    use_device_cache = use_device_cache and shapes_uniform

    if getattr(cfg, 'pallas_trunk', False):
        # multi-device: the fused canvas kernel runs per device under
        # shard_map on the local batch shard (BN stats + weight grads
        # psum-ed over 'data' inside the op — ops/pallas/conv_block.py);
        # registering the mesh here makes the next trace pick it up.
        from ..ops.pallas.conv_block import set_trunk_mesh
        set_trunk_mesh(mesh)

    if use_device_cache:
        # cache replicated across the mesh so every chip gathers locally
        pipeline = DevicePipeline(
            trainset, cfg, seed=rng_seed,
            sharding=replicated(mesh) if mesh is not None else None)
        cache = pipeline.cache
    else:
        pipeline = TrainPipeline(trainset, cfg, seed=rng_seed)
        cache = None
    # NO transform — in-train validation feeds UNSHIFTED scenes even when
    # train_shift != 0, exactly like the reference (its valset is built
    # without the Shift transform, reference train/cli.py:102-105; only
    # the validate CLI re-applies the shift).  In-train val metrics under
    # a static shift are therefore comparable to the reference's, not to
    # the validate CLI's.
    valset = HCI4D(cfg.train_valset, cache=True)

    if cfg.model_inn:
        from ..models.inn import INN
        model = INN.from_config(cfg)
    else:
        model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()   # torch-Adam moments; LR applied in-step

    ps = cfg.train_ps
    dummy = [jnp.zeros((1, cfg.model_views, ps, ps, 3), jnp.float32)] * 4
    state = init_state(cfg, model, tx, dummy)

    i = 0
    if resume_raw is not None:
        print('Resume training...')
        tree = {'params': state.params, 'batch_stats': state.batch_stats,
                'opt_state': state.opt_state}
        restored, meta = restore_from_raw(resume_raw, tree)
        resume_raw = None   # free the host copy
        state = TrainState(params=restored['params'],
                           batch_stats=restored['batch_stats'],
                           opt_state=restored['opt_state'],
                           step=jnp.asarray(meta['iteration'], jnp.int32))
        i = int(meta['iteration'])

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    step_train = make_train_step(cfg, model, tx, bn_train=True,
                                 use_cache=cache is not None, mesh=mesh)
    step_eval = None   # built lazily for --train_eval_mode

    val_fwd = make_val_forward(cfg, model)

    mode = 'a' if cfg.train_resume else 'w'
    log = open(os.path.join(output_dir, 'log.csv'), mode)
    if progress:
        print(LOG_HEADER)
    if not cfg.train_resume:
        print(LOG_HEADER, file=log)

    model_saver = ModelSaver(only_best=False)
    loss_val_avg = mse_avg = bad_pix_avg = 0.0
    # time_elapsed clock.  Rows are emitted through the lag ring below and
    # a row's step has only verifiably COMPLETED on device once its loss
    # readback resolves — so the column is measured between consecutive
    # emits (≈ true device step wall in steady state), not between
    # dispatches (which would report the ~ms host time of enqueueing work
    # on an async backend).  First row's time_elapsed is the absolute unix
    # time — the reference's exact quirk (reference train/cli.py:184
    # `time_start = 0`).
    time_start = 0.0
    profiling = False

    parity_guard = cache is not None and not cfg.train_no_data_augment
    accum_n = max(1, int(getattr(cfg, 'train_accum', 1)))

    # Reading the loss back for the log row forces a full device sync
    # every step — on the remote TPU that idles the chip for ~2 relay
    # RTTs + the host work (~16% of a bs=128 step, bench.py's async vs
    # synced gap).  Emit log rows through a small lag ring instead: the
    # D2H copy is started asynchronously at dispatch time and the row is
    # printed log_lag steps later with identical values, so the device
    # always has the next step enqueued.  --train_nan_guard keeps lag 0:
    # it must sync every step anyway to fail BEFORE the val-step
    # checkpoint can save the poisoned state, so lagging buys nothing.
    log_lag = 0 if cfg.train_nan_guard else 3
    pending = collections.deque()   # (step, loss_dev, val snapshot)

    def emit_row(row):
        nonlocal time_start
        j, loss_dev, lv, ms, bp = row
        loss_f = float(loss_dev)    # blocks until step j has executed
        now = time.time()
        dt = now - time_start
        time_start = now
        line = (f'{j:>7}, {loss_f:.8f}, {lv:.8f}, '
                f'{ms:.8f}, {bp:.8f}, {dt:.8f}')
        if progress:
            print(line)
        print(line, file=log, flush=True)

    # graceful preemption (TPU-native extension; SURVEY §5 "failure
    # detection / elastic recovery": the reference has none): on SIGTERM —
    # pod preemption, scheduler eviction — finish the in-flight step,
    # checkpoint at the CURRENT iteration and return cleanly, so
    # --train_resume loses at most one step instead of everything since
    # the last val-interval save.  Handlers only install on the main
    # thread (a CPython requirement); the previous handler is restored on
    # exit so nested callers keep their semantics.
    def save_rolling_checkpoint():
        """Rolling checkpoint at the loop's CURRENT (state, i) — shared by
        the val-interval save and the SIGTERM save so the PAYLOAD can
        never diverge between the two paths.  The iteration stamp's
        meaning intentionally differs by one: the val-interval save runs
        BEFORE ``i += 1`` (resume re-runs step i — the reference's replay
        quirk, its loop also checkpoints pre-increment), while the SIGTERM
        save runs AFTER it (resume continues at the next step, replaying
        nothing — replay-free is the right semantics for preemption,
        where the same pod may be rescheduled immediately)."""
        tree = {'params': state.params,
                'batch_stats': state.batch_stats,
                'opt_state': state.opt_state}
        # real pass counter over the virtual-length dataset (the
        # reference stores epoch=None here, train/cli.py:328)
        epoch = i // max(1, len(trainset) // cfg.train_bs)
        model_saver(output_dir, tree, cfg.to_dict(), epoch, i,
                    loss_val_avg)

    term_event = None
    prev_term = None
    if cfg.train_term_checkpoint and \
            threading.current_thread() is threading.main_thread():
        term_event = threading.Event()
        prev_term = signal.signal(signal.SIGTERM,
                                  lambda _s, _f: term_event.set())

    try:
        while True:
            batch = pipeline.sample_batch(cfg.train_bs)
            if parity_guard:
                # cheap host-side check of the stratified-rotation contract
                # the in-step parity transpose relies on (pipeline.py)
                from ..data.pipeline import check_rot_parity
                check_rot_parity(batch.aug.rot_k, accum_n)
            if mesh is not None:
                batch = shard_batch(mesh, batch)

            eval_mode = (cfg.train_eval_mode
                         and i >= cfg.train_eval_mode_start)
            if eval_mode and step_eval is None:
                step_eval = make_train_step(cfg, model, tx, bn_train=False,
                                            use_cache=cache is not None,
                                            mesh=mesh)
            # observability (SURVEY §5: the reference has none beyond wall
            # clock): optional profiler trace of steady-state steps + NaN guard
            if cfg.train_profile and i == 10:
                jax.profiler.start_trace(os.path.join(output_dir, 'profile'))
                profiling = True
            state, loss_train = (step_eval if eval_mode else step_train)(
                state, batch, cache)
            if profiling and i >= 15:
                jax.block_until_ready(loss_train)
                jax.profiler.stop_trace()
                profiling = False
                print(f'profiler trace written to {output_dir}/profile')

            if cfg.train_nan_guard and not np.isfinite(float(loss_train)):
                raise FloatingPointError(
                    f'non-finite training loss at step {i}: '
                    f'{float(loss_train)}')

            if i % cfg.val_interval == 0:
                # flush lagged rows first so validation wall time never
                # lands inside a training row's time_elapsed (the reference
                # also excludes it: its time_elap is taken before the val
                # block, train/cli.py:260,267)
                while pending:
                    emit_row(pending.popleft())
                loss_val_avg = mse_avg = bad_pix_avg = 0.0
                variables = {'params': state.params,
                             'batch_stats': state.batch_stats}
                n_scenes = len(valset.scenes)
                for j in range(n_scenes):
                    h, v, ii, d, center, gt, mpi, _, index = valset[j]
                    from ..data.pipeline import pad_mpi
                    stacks = [jnp.asarray(x[None]) for x in (h, v, ii, d)]
                    gt_j = jnp.asarray(gt[None])
                    mpi_j = jnp.asarray(pad_mpi(mpi)[None])

                    output, lv, mse_j, bp_j = val_fwd(variables, *stacks,
                                                      gt_j, mpi_j)
                    loss_val_avg += float(lv)
                    mse_avg += float(mse_j)
                    bad_pix_avg += float(bp_j)

                    logvar = output.get('logvar')
                    valset.save_batch(
                        output_dir, np.asarray(index)[None],
                        np.asarray(output['mean']),
                        None if logvar is None else np.asarray(logvar))

                loss_val_avg /= n_scenes
                mse_avg /= n_scenes
                bad_pix_avg /= n_scenes

                save_rolling_checkpoint()

                # exclude the validation wall time from the next row's
                # clock — but keep the very first row's absolute-unix-time
                # quirk (time_start == 0 until the first emit)
                if time_start:
                    time_start = time.time()

            if hasattr(loss_train, 'copy_to_host_async'):
                loss_train.copy_to_host_async()   # overlap D2H with compute
            pending.append((i, loss_train, loss_val_avg, mse_avg,
                            bad_pix_avg))
            while len(pending) > log_lag:
                emit_row(pending.popleft())

            i += 1
            if term_event is not None and term_event.is_set():
                while pending:
                    emit_row(pending.popleft())
                save_rolling_checkpoint()
                print(f'SIGTERM: checkpoint written after step {i - 1} '
                      f'({i} steps completed); exiting cleanly (continue '
                      f'with --train_resume)', file=sys.stderr)
                break
            if cfg.train_steps and i >= cfg.train_steps:
                # persist the COMPLETED state: the rolling val-interval save
                # above stamps pre-increment at the last boundary BEFORE
                # train_steps, so without this a bounded run's final
                # (train_steps - 1 - last_boundary) steps were never
                # checkpointed.  Post-increment stamp == train_steps marks
                # the run complete (scripts/ckpt_step.py keys off it to
                # stamp arm DONE files — VERDICT r4 weak #2).
                save_rolling_checkpoint()
                break
        while pending:
            emit_row(pending.popleft())

    finally:
        # drain the async checkpoint writer even when the loop raises
        # (e.g. the NaN guard) — the last enqueued checkpoint is the
        # one wanted for the post-mortem.  When an exception is ALREADY
        # propagating, a pending async-write error from close() must not
        # replace it as the visible root cause (ADVICE r2) — log it and
        # let the original exception continue.
        in_flight = sys.exc_info()[0] is not None
        if profiling:
            # short runs (train_steps < 16) and mid-trace exceptions must
            # still flush the trace to disk
            try:
                jax.profiler.stop_trace()
                print(f'profiler trace written to {output_dir}/profile')
            except Exception as exc:
                print(f'profiler stop failed during shutdown: {exc!r}',
                      file=sys.stderr)
        try:
            # best-effort flush of lagged log rows when the loop raised
            # mid-stream (clean exits drained `pending` already)
            while pending:
                emit_row(pending.popleft())
        except Exception as exc:
            print(f'log flush failed during shutdown: {exc!r}',
                  file=sys.stderr)
        try:
            model_saver.close()
        except Exception as exc:
            if not in_flight:
                raise
            print(f'checkpoint writer failed during shutdown: {exc!r}',
                  file=sys.stderr)
        finally:
            if term_event is not None:
                # prev is None when the handler was installed outside
                # Python — SIG_DFL is the closest restorable state
                signal.signal(signal.SIGTERM,
                              prev_term if prev_term is not None
                              else signal.SIG_DFL)
            log.close()
            pipeline.close()
    return state
