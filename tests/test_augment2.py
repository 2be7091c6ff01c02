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


def test_integer_shift_exact(pipe):
    """Integer disparities make the lerp degenerate — exact equality with
    the circular roll."""
    db = pipe.sample_batch(4)
    db = db._replace(aug=db.aug._replace(
        shift=np.array([1.0, -1.0, 0.0, 1.0], np.float32)))
    _compare(pipe, db, atol=1e-6)
