"""Working-INN tests (models/inn.py — beyond reference: the upstream INN
path is dead code).  No oracle exists, so the tests are self-consistency:
exact invertibility, log-det vs an autodiff Jacobian, readout math, and an
end-to-end train→validate smoke."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.models.inn import INN

SMALL = dict(model_views=3, model_in_blocks=1, model_out_blocks=2,
             model_inn=True)


def _stacks(rng, views=3, hw=8, b=1):
    return [jnp.asarray(rng.random((b, views, hw, hw, 3), dtype=np.float32))
            for _ in range(4)]


def _init(cfg, stacks, seed=0):
    model = INN.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(seed), *stacks)
    return model, variables


def test_inn_shapes_and_readout():
    cfg = Config(**SMALL).finalize()
    rng = np.random.default_rng(0)
    stacks = _stacks(rng)
    model, variables = _init(cfg, stacks)
    out = model.apply(variables, *stacks)

    dims = 4 * 3 * 3
    assert model.dims == dims == cfg.steps
    assert out['zixels'].shape == (1, 8, 8, dims)
    assert out['dists'].shape == (1, 8, 8, dims)
    assert out['jac'].shape == (1,)
    assert out['mean'].shape == (1, 8, 8)
    assert out['logvar'].shape == (1, 8, 8)

    post = np.asarray(out['posterior'])
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-5)
    # one_hot marks the min-distance cluster; mean is its bin center
    dists = np.asarray(out['dists'])
    oh = np.asarray(out['one_hot'])
    np.testing.assert_array_equal(oh.argmax(-1), dists.argmin(-1))
    bins = np.linspace(-3.5, 3.5, dims)
    np.testing.assert_allclose(np.asarray(out['mean']),
                               bins[dists.argmin(-1)], atol=1e-5)


@pytest.mark.parametrize('soft', [False, True])
def test_inn_invertibility(soft):
    """inverse(zixels) reconstructs all four input stacks exactly."""
    cfg = Config(model_soft_permutation=soft, **SMALL).finalize()
    rng = np.random.default_rng(1)
    stacks = _stacks(rng)
    model, variables = _init(cfg, stacks)
    out = model.apply(variables, *stacks)
    rec = model.inverse(variables, out['zixels'])
    for s, r in zip(stacks, rec):
        assert r.shape == s.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(s), atol=2e-4)


def test_inn_logdet_vs_autodiff_jacobian():
    """The accumulated log-det matches log|det| of the actual Jacobian."""
    cfg = Config(model_views=1, model_in_blocks=1, model_out_blocks=1,
                 model_inn=True, model_soft_permutation=True).finalize()
    rng = np.random.default_rng(2)
    hw = 4
    stacks = _stacks(rng, views=1, hw=hw)
    model, variables = _init(cfg, stacks)
    dims = model.dims                                   # 12

    shapes = [s.shape for s in stacks]
    sizes = [int(np.prod(sh)) for sh in shapes]

    def flat_fwd(flat):
        xs, o = [], 0
        for sh, n in zip(shapes, sizes):
            xs.append(flat[o:o + n].reshape(sh))
            o += n
        out = model.apply(variables, *xs)
        return out['zixels'].reshape(-1), out['jac']

    flat = jnp.concatenate([s.reshape(-1) for s in stacks])
    jacmat = jax.jacfwd(lambda f: flat_fwd(f)[0])(flat)
    _, logdet_auto = jnp.linalg.slogdet(jacmat)
    _, jac_norm = flat_fwd(flat)
    logdet_model = float(jac_norm[0]) * dims * hw * hw
    np.testing.assert_allclose(logdet_model, float(logdet_auto),
                               rtol=1e-4, atol=1e-3)


def test_inn_train_and_validate_smoke(tmp_path):
    """--model_inn end to end: a few train steps, checkpoint, validate CLI."""
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.train.loop import train
    from mmlf_tpu.validate.cli import run_validation

    train_dir = str(tmp_path / 'train')
    val_dir = str(tmp_path / 'val')
    generate_dataset(train_dir, scenes=1, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=5)
    out = str(tmp_path / 'run_inn')
    os.makedirs(out)

    # 9 views: the synthetic scenes carry 9-view stacks and the INN's
    # coupling splits are static in the channel count (dims = 108 = the
    # validate CLI's bin grid, exercising the discrete-like KLD branch)
    cfg = Config(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=2, train_ps=32, train_lr=1e-4, train_max_downscale=1,
        val_interval=2, train_steps=3, val_loss_margin=5,
        model_views=9, model_in_blocks=1, model_out_blocks=1,
        model_inn=True).finalize()
    train(cfg, out, progress=False)

    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    assert len(log) == 4                      # header + 3 steps
    losses = [float(line.split(',')[1]) for line in log[1:]]
    assert all(np.isfinite(losses))

    metrics = run_validation(out, val_dir, val_loss_margin=5)
    for k in ('mse', 'badpix', 'kld', 'nll'):
        assert np.isfinite(metrics[k]), k
