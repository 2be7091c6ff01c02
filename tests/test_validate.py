"""Validate-CLI integration tests: trained checkpoint, torch checkpoint,
posterior math parity."""

import os
import sys

import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.train.loop import train
from mmlf_tpu.validate import posteriors as P
from mmlf_tpu.validate.cli import run_validation


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('valtest')
    train_dir = str(root / 'train')
    val_dir = str(root / 'val')
    generate_dataset(train_dir, scenes=1, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=5)
    return root, train_dir, val_dir


def test_validate_after_training(env):
    root, train_dir, val_dir = env
    out = str(root / 'run_uncert')
    os.makedirs(out, exist_ok=True)
    cfg = Config(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=2, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=2, train_steps=2, model_chs=6, model_in_blocks=1,
        model_out_blocks=2, model_uncert=True, val_loss_margin=5,
    ).finalize()
    train(cfg, out, progress=False)

    metrics = run_validation(out, val_dir, val_loss_margin=5)
    for k in ('mse', 'badpix', 'kld', 'kld_mm', 'kld_um', 'nll'):
        assert np.isfinite(metrics[k]), k

    scene = 'scene_00'
    sdir = os.path.join(out, 'scenes', scene)
    for f in ('result.pfm', 'uncert.pfm', 'posterior.npy'):
        assert os.path.exists(os.path.join(sdir, f)), f
    post = np.load(os.path.join(sdir, 'posterior.npy'))
    assert post.shape[0] == 108   # bin-first on disk, reference layout


def test_validate_from_torch_checkpoint(env):
    """A reference-format checkpoint.pt evaluates directly."""
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.feed_forward import FeedForward as TorchFF

    root, train_dir, val_dir = env
    out = str(root / 'torch_ckpt')
    os.makedirs(out, exist_ok=True)

    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    tmodel = TorchFF(**cfg.to_dict())
    torch.save({'model_state_dict': tmodel.state_dict(),
                'optimizer_state_dict': None,
                'hyper_parameters': cfg.to_dict(),
                'epoch': None, 'iteration': 7, 'loss': 0.5},
               os.path.join(out, 'checkpoint.pt'))

    metrics = run_validation(out, val_dir, val_loss_margin=5)
    assert np.isfinite(metrics['mse'])


def test_posterior_discretizations_sum_to_one():
    rng = np.random.default_rng(0)
    mean = rng.uniform(-2, 2, (1, 8, 8)).astype(np.float32)
    logvar = rng.uniform(-1, 0.5, (1, 8, 8)).astype(np.float32)
    d = np.asarray(P.laplace_to_discrete(108, -3.5, 3.5, mean, logvar))
    # bins cover slightly more than the support; mass close to 1
    assert d.shape == (1, 8, 8, 108)
    assert (d >= 0).all()
    assert d.sum(-1).max() <= 1.0 + 1e-5

    one_hot = np.asarray(P.mean_to_discrete(108, -3.5, 3.5, mean))
    assert one_hot.sum(-1).max() <= 1.0


def test_kld_zero_for_identical():
    rng = np.random.default_rng(1)
    dist = rng.uniform(0.1, 1.0, (1, 4, 4, 10)).astype(np.float32)
    assert float(P.kl_divergence(dist, dist.copy())) == pytest.approx(
        0.0, abs=1e-6)
    other = np.roll(dist, 3, -1)
    assert float(P.kl_divergence(other, dist)) > 0.01


def test_posteriors_vs_reference_formulas():
    """Compare against the reference validation helpers run in numpy."""
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.validate import cli as ref

    rng = np.random.default_rng(2)
    b, h, w = 1, 6, 6
    mean = rng.uniform(-2, 2, (b, h, w)).astype(np.float64)
    logvar = rng.uniform(-1, 0.5, (b, h, w)).astype(np.float64)

    ours = np.asarray(P.laplace_to_discrete(54, -3.5, 3.5, mean, logvar))
    theirs = ref.laplace_to_discrete(54, -3.5, 3.5, mean, logvar)
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), theirs,
                               atol=1e-6)

    ours = np.asarray(P.mean_to_discrete(54, -3.5, 3.5, mean))
    theirs = ref.mean_to_discrete(54, -3.5, 3.5, mean)
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), theirs,
                               atol=1e-6)

    # nll_laplace on a 2-plane MPI — ours (b, K, H, W, 5) vs ref (b, K, 5, h, w)
    mpi = rng.uniform(0, 1, (b, 2, h, w, 5)).astype(np.float64)
    mpi[..., 4] = rng.uniform(-2, 2, (b, 2, h, w))
    ref_mpi = np.transpose(mpi, (0, 1, 4, 2, 3))
    ours_v = float(P.nll_laplace(mpi, mean, logvar))
    theirs_v = float(ref.nll_laplace(ref_mpi, mean, logvar, None))
    assert ours_v == pytest.approx(theirs_v, rel=1e-5)

    # kl_divergence (b=1 path in the reference)
    dist = rng.uniform(0.01, 1, (b, 10, h, w))
    dist_gt = rng.uniform(0.01, 1, (b, 10, h, w))
    ours_v = float(P.kl_divergence(
        np.transpose(dist, (0, 2, 3, 1)), np.transpose(dist_gt, (0, 2, 3, 1))))
    theirs_v = float(ref.kl_divergence(dist.copy(), dist_gt.copy()))
    assert ours_v == pytest.approx(theirs_v, rel=1e-5)

    mm = rng.uniform(0, 1, (b, h, w))
    ours_v = float(P.kl_divergence(
        np.transpose(dist, (0, 2, 3, 1)), np.transpose(dist_gt, (0, 2, 3, 1)),
        mm))
    theirs_v = float(ref.kl_divergence(dist.copy(), dist_gt.copy(), mm))
    assert ours_v == pytest.approx(theirs_v, rel=1e-5)

    # nll_discrete incl. the /7.0 quirk
    weights = rng.uniform(0, 1, (b, 10, h, w))
    post = rng.uniform(0.01, 1, (b, 10, h, w))
    ours_v = float(P.nll_discrete(
        np.transpose(weights, (0, 2, 3, 1)).copy(),
        np.transpose(post, (0, 2, 3, 1)).copy()))
    theirs_v = float(ref.nll_discrete(weights.copy(), post.copy(),
                                      -3.5, 3.5, None))
    assert ours_v == pytest.approx(theirs_v, rel=1e-5)
