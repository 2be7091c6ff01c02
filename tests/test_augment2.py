"""Matmul-domain augmentation (data/augment2.py) must reproduce the legacy
per-sample chain (pipeline.augment_sample) exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data import HCI4D
from mmlf_tpu.data.pipeline import (DevicePipeline, augment_batch,
                                    gather_augment, gather_windows)
from mmlf_tpu.data.synth import generate_dataset


@pytest.fixture(scope='module')
def pipe(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('aug2'))
    generate_dataset(root, scenes=2, size=128, seed=0)
    cfg = Config(train_ps=32, train_max_downscale=2,
                 train_shift=0.5).finalize()
    return DevicePipeline(HCI4D(root, cache=True), cfg, seed=11)


def _compare(pipe, db, with_mpi=True, atol=1e-5):
    legacy = augment_batch(gather_windows(pipe.cache, db, pipe.win), 32)
    fused = gather_augment(pipe.cache, db, 32, pipe.win, with_mpi=with_mpi)
    names = ['h', 'v', 'i', 'd', 'gt', 'mpi', 'mask']
    for name, a, b in zip(names, legacy, fused):
        if name == 'mpi' and not with_mpi:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol,
            err_msg=f'field {name} diverges')


def test_full_chain_matches_legacy(pipe):
    db = pipe.sample_batch(8)
    _compare(pipe, db)


def test_every_rotation_and_sign(pipe):
    """Pin one sample per (rot_k, shift sign) combination."""
    db = pipe.sample_batch(8)
    aug = db.aug._replace(
        rot_k=np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32),
        shift=np.array([0.6, 0.6, 0.6, 0.6, -0.8, -0.8, 0.0, -0.3],
                       np.float32))
    db = db._replace(aug=aug)
    _compare(pipe, db)


def test_no_mpi_path(pipe):
    db = pipe.sample_batch(4)
    _compare(pipe, db, with_mpi=False)


def test_parity_split_matches_legacy(pipe):
    """The stratified-rotation fast path (one static half-batch transpose,
    flips folded into the shift matrices) must equal the legacy chain for
    every (even, odd) rotation pairing the contract allows."""
    db = pipe.sample_batch(8)
    # sample_batch (DevicePipeline) stratifies: first half even, rest odd
    assert np.all(np.asarray(db.aug.rot_k[:4]) % 2 == 0)
    assert np.all(np.asarray(db.aug.rot_k[4:]) % 2 == 1)
    for rot in ([0, 2, 0, 2, 1, 3, 1, 3], [2, 2, 2, 2, 3, 3, 3, 3],
                [0, 0, 2, 2, 1, 1, 3, 3]):
        dbr = db._replace(aug=db.aug._replace(
            rot_k=np.asarray(rot, np.int32)))
        legacy = augment_batch(gather_windows(pipe.cache, dbr, pipe.win), 32)
        fused = gather_augment(pipe.cache, dbr, 32, pipe.win, parity=True)
        for name, a, b in zip(['h', 'v', 'i', 'd', 'gt', 'mpi', 'mask'],
                              legacy, fused):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f'field {name} diverges (rot={rot})')


def test_fold_matches_model_fold(pipe):
    """fold=True must equal FeedForward._fold applied to the unfolded
    stacks (same values, model channel order view*3+color)."""
    db = pipe.sample_batch(6)
    plain = gather_augment(pipe.cache, db, 32, pipe.win)
    folded = gather_augment(pipe.cache, db, 32, pipe.win, fold=True)
    for name, a, b in zip(['h', 'v', 'i', 'd'], plain[:4], folded[:4]):
        n = a.shape[1]
        ref = np.transpose(np.asarray(a), (0, 2, 3, 1, 4)).reshape(
            a.shape[0], a.shape[2], a.shape[3], n * 3)
        np.testing.assert_allclose(ref, np.asarray(b), atol=1e-5,
                                   err_msg=f'stack {name} diverges')
    # targets are unaffected by fold
    for name, a, b in zip(['gt', 'mpi', 'mask'], plain[4:], folded[4:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=f'target {name} diverges')


def test_fold_parity_train_layout(pipe):
    """The exact train-step combination: parity-stratified batch,
    fold=True — against the legacy chain + manual fold."""
    db = pipe.sample_batch(8)
    legacy = augment_batch(gather_windows(pipe.cache, db, pipe.win), 32)
    fused = gather_augment(pipe.cache, db, 32, pipe.win, parity=True,
                           fold=True)
    for name, a, b in zip(['h', 'v', 'i', 'd'], legacy[:4], fused[:4]):
        n = a.shape[1]
        ref = np.transpose(np.asarray(a), (0, 2, 3, 1, 4)).reshape(
            a.shape[0], a.shape[2], a.shape[3], n * 3)
        np.testing.assert_allclose(ref, np.asarray(b), atol=1e-5,
                                   err_msg=f'stack {name} diverges')


def test_integer_shift_exact(pipe):
    """Integer disparities make the lerp degenerate — exact equality with
    the circular roll."""
    db = pipe.sample_batch(4)
    db = db._replace(aug=db.aug._replace(
        shift=np.array([1.0, -1.0, 0.0, 1.0], np.float32)))
    _compare(pipe, db, atol=1e-6)


@pytest.mark.parametrize('ps,shift,maxf,bs,fold,parity,bf16', [
    (16, 0.0, 1, 4, False, False, False),
    (16, 2.5, 2, 8, True, True, False),
    (48, -1.0, 2, 4, False, False, False),   # maxf clamps: win 80 > 64px@f2
    (48, 0.5, 1, 8, True, True, True),
    (32, 2.5, 3, 8, True, False, True),
    (32, -0.5, 2, 6, False, True, False),
])
def test_fused_path_config_sweep(tmp_path_factory, ps, shift, maxf, bs,
                                 fold, parity, bf16):
    """Randomized-config equivalence sweep: the fused input path must match
    the legacy gather+augment chain across patch sizes, static shifts,
    downsample ranges, batch sizes, the fold/parity fast paths, and the
    bf16 scene cache — not just the one canonical config above."""
    root = str(tmp_path_factory.mktemp(f'sweep{ps}{maxf}{bs}'))
    generate_dataset(root, scenes=2, size=128, seed=3)
    cfg = Config(train_ps=ps, train_max_downscale=maxf, train_shift=shift,
                 cache_bf16=bf16).finalize()
    pipe = DevicePipeline(HCI4D(root, cache=True), cfg, seed=7)
    db = pipe.sample_batch(bs)

    legacy = augment_batch(gather_windows(pipe.cache, db, pipe.win), ps)
    fused = gather_augment(pipe.cache, db, ps, pipe.win,
                           parity=parity, fold=fold)
    atol = 2e-2 if bf16 else 1e-5
    for name, a, b in zip(['h', 'v', 'i', 'd', 'gt', 'mpi', 'mask'],
                          legacy, fused):
        a = np.asarray(a)
        if fold and name in ('h', 'v', 'i', 'd'):
            n = a.shape[1]
            a = np.transpose(a, (0, 2, 3, 1, 4)).reshape(
                a.shape[0], a.shape[2], a.shape[3], n * 3)
        np.testing.assert_allclose(
            a, np.asarray(b), atol=atol,
            err_msg=f'field {name} diverges at ps={ps} shift={shift} '
                    f'maxf={maxf} bs={bs} fold={fold} parity={parity} '
                    f'bf16={bf16}')
