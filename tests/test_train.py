"""End-to-end training integration tests on a synthetic mini-dataset."""

import os

import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.train.loop import train


@pytest.fixture(scope='module')
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp('ds')
    train_dir = str(root / 'train')
    val_dir = str(root / 'val')
    generate_dataset(train_dir, scenes=2, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=7)
    return train_dir, val_dir


def _cfg(data_dirs, **kw):
    train_dir, val_dir = data_dirs
    base = dict(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=4, train_ps=32, train_lr=1e-3,
        train_max_downscale=1,       # 64px scenes can't downscale further
        val_interval=2, val_loss_margin=5, train_steps=4,
        model_chs=8, model_in_blocks=1, model_out_blocks=2,
    )
    base.update(kw)
    return Config(**base).finalize()


@pytest.mark.parametrize('head', ['base', 'uncert', 'discrete'])
def test_train_heads_run_and_log(data_dirs, tmp_path, head):
    out = str(tmp_path / head)
    os.makedirs(out)
    cfg = _cfg(data_dirs,
               model_uncert=(head == 'uncert'),
               model_discrete=(head == 'discrete'))
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4

    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    assert log[0].startswith('   iter')
    assert len(log) == 5   # header + 4 steps
    # losses are finite
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))

    # checkpoint written with config inside
    assert os.path.exists(os.path.join(out, 'checkpoint.msgpack'))
    import json
    hyper = json.load(open(os.path.join(out, 'hyper_parameters.json')))
    assert hyper['model_uncert'] == (head == 'uncert')

    # validation artifacts written
    assert os.path.exists(os.path.join(out, 'ours', 'disp_maps'))


def test_train_multimodal_loss(data_dirs, tmp_path):
    out = str(tmp_path / 'mm')
    os.makedirs(out)
    cfg = _cfg(data_dirs, model_uncert=True, train_loss_multimodal=True)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4


def test_resume_restores_step_and_params(data_dirs, tmp_path):
    out = str(tmp_path / 'resume')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=3)
    state1 = train(cfg, out, progress=False)

    cfg2 = _cfg(data_dirs, train_steps=5, train_resume=True)
    state2 = train(cfg2, out, progress=False)
    assert int(state2.step) == 5

    # resumed log appended, not truncated
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    iters = [int(l.split(',')[0]) for l in log[1:]]
    assert iters == [0, 1, 2, 2, 3, 4]   # step-3 run + resumed 2..4


def test_train_loss_decreases_base(data_dirs, tmp_path):
    """On the synthetic scenes a small model must make progress."""
    out = str(tmp_path / 'learn')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=30, train_bs=8, train_lr=3e-3,
               val_interval=30, train_no_data_augment=True)
    train(cfg, out, progress=False)
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
