"""Full-configuration oracle parity (VERDICT r1 item 3).

Round 1's torch-oracle tests ran at toy size (chs=8, 3 views, 16-px inputs);
float drift, channel padding, and orientation-folding bugs that only appear
at the paper configuration would slip through.  These tests re-run the
comparison at the reference's real shape — ``model_chs=70``, 9 views,
3 in-blocks + 8 out-blocks (reference mmlf/train/cli.py defaults),
512-px eval input, and the full 70-member ESE grid — plus a converted
checkpoint round-trip (torch checkpoint.pt → our msgpack → validate CLI).

Opt-in: each test is minutes of single-core CPU oracle time.  Run with
``pytest --runslow tests/test_full_size.py`` (or ``RUN_SLOW=1``).
Last full run recorded in docs/STATUS.md.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.models import FeedForward

pytestmark = pytest.mark.slow

# the paper / reference-README configuration (reference mmlf/train/cli.py
# defaults: model_chs=70, model_views=9, 3 in-blocks, 8 out-blocks)
FULL = dict(model_chs=70, model_views=9, model_in_blocks=3,
            model_out_blocks=8)


def _reference_model(cfg: Config):
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.feed_forward import FeedForward as TorchFF
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchFF(**cfg.to_dict())
    model.eval()
    return model, torch


def _randomize(tmodel, torch, seed=0):
    """INPUT-SENSITIVE random weights (kaiming convs) with nontrivial BN
    stats.  Round 1 used 0.05-scale weights, which attenuated all input
    signal through the 11-layer trunk — the parity comparison then only
    exercised the bias/BN pathway and missed an orientation-fold bug
    (see tests/test_model.py::_randomize_live)."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim == 4:
                torch.nn.init.kaiming_normal_(p)
            else:
                p.copy_(torch.randn_like(p) * 0.1)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5
                                    + 0.75)


def _stacks(hw, views, seed=1):
    rng = np.random.default_rng(seed)
    return [rng.random((1, views, hw, hw, 3), dtype=np.float32)
            for _ in range(4)]


def _torch_forward(tmodel, torch, stacks_np):
    with torch.no_grad():
        return tmodel(*[torch.from_numpy(
            np.ascontiguousarray(np.transpose(s, (0, 1, 4, 2, 3))))
            for s in stacks_np])


@pytest.mark.parametrize('head', ['uncert', 'discrete'])
def test_full_size_trunk_parity(head):
    """chs=70 / 9-view / 3+8-block trunk at 512² eval input vs the torch
    oracle (reference mmlf/model/feed_forward.py:206-305)."""
    from mmlf_tpu.utils.convert import torch_state_to_flax

    cfg = Config(model_uncert=(head == 'uncert'),
                 model_discrete=(head == 'discrete'), **FULL).finalize()
    tmodel, torch = _reference_model(cfg)
    _randomize(tmodel, torch)

    variables = torch_state_to_flax(
        tmodel.state_dict(), in_blocks=cfg.model_in_blocks,
        out_blocks=cfg.model_out_blocks)

    stacks_np = _stacks(512, cfg.model_views)
    tout = _torch_forward(tmodel, torch, stacks_np)

    model = FeedForward.from_config(cfg)
    jout = jax.jit(model.apply)(variables,
                                *[jnp.asarray(s) for s in stacks_np])

    # 11 conv layers at 630/2520 fan-in accumulate ~1e-3 of fp32 noise;
    # tolerances scaled up from the toy test's 5e-4 accordingly
    np.testing.assert_allclose(np.asarray(jout['mean']),
                               tout['mean'].numpy(), atol=2e-3)
    if head == 'uncert':
        np.testing.assert_allclose(np.asarray(jout['logvar']),
                                   tout['logvar'].numpy(), atol=2e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(jout['posterior']), (0, 3, 1, 2)),
            tout['posterior'].numpy(), atol=2e-3)
    else:
        np.testing.assert_allclose(
            np.transpose(np.asarray(jout['scores']), (0, 3, 1, 2)),
            tout['scores'].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(jout['posterior']), (0, 3, 1, 2)),
            tout['posterior'].numpy(), atol=5e-3)


def test_full_size_ensemble_parity():
    """Full 70-member ESE grid (±3.5, step 0.1) at chs=70/9 views vs the
    reference Ensamble (mmlf/model/ensamble.py:40-118).

    Spatial size is 64² — the ESE cost is 70 full trunk forwards on both
    sides (hours at 512² on this 1-core host), while the grid construction,
    EPI-shift wrap (reach ±3.5×4 views = ±14 px, well inside 64²),
    min-logvar selection, and mixture posterior are spatial-size-independent.
    The 512² trunk itself is covered by test_full_size_trunk_parity."""
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.ensamble import Ensamble as TorchEns
    from mmlf_tpu.models.ensemble import ensemble_forward, ensemble_grid
    from mmlf_tpu.utils.convert import torch_state_to_flax

    cfg = Config(model_uncert=True, **FULL).finalize()
    tmodel, torch = _reference_model(cfg)
    _randomize(tmodel, torch)
    tens = TorchEns(tmodel, -3.5, 3.5, 0.1)

    stacks_np = _stacks(64, cfg.model_views)
    with torch.no_grad():
        tout = tens(*[torch.from_numpy(
            np.ascontiguousarray(np.transpose(s, (0, 1, 4, 2, 3))))
            for s in stacks_np])

    variables = torch_state_to_flax(
        tmodel.state_dict(), in_blocks=cfg.model_in_blocks,
        out_blocks=cfg.model_out_blocks)
    model = FeedForward.from_config(cfg)
    jout = ensemble_forward(
        lambda v, *s: model.apply(v, *s), variables,
        *[jnp.asarray(s) for s in stacks_np],
        disp_min=-3.5, disp_max=3.5, disp_step=0.1)

    assert len(ensemble_grid(-3.5, 3.5, 0.1)) == 70
    assert jout['means'].shape[0] == 70
    np.testing.assert_allclose(np.asarray(jout['means']),
                               tout['means'].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout['logvars']),
                               tout['logvars'].numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jout['posterior']), (0, 3, 1, 2)),
        tout['posterior'].numpy(), atol=2e-3)


def test_full_size_checkpoint_roundtrip(tmp_path):
    """Converted-checkpoint round trip at the paper configuration:
    reference checkpoint.pt → validate CLI, then torch → our msgpack →
    validate CLI; both runs must produce identical metrics
    (VERDICT r1 item 3 'converted-checkpoint round-trip save→validate')."""
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')

    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.train.checkpoint import save_checkpoint
    from mmlf_tpu.utils.convert import load_reference_checkpoint
    from mmlf_tpu.validate.cli import run_validation

    cfg = Config(model_uncert=True, **FULL).finalize()
    tmodel, torch = _reference_model(cfg)
    _randomize(tmodel, torch)

    val_dir = str(tmp_path / 'val')
    generate_dataset(val_dir, scenes=1, size=128, seed=3)

    tdir = str(tmp_path / 'torch_ckpt')
    os.makedirs(tdir)
    torch.save({'model_state_dict': tmodel.state_dict(),
                'optimizer_state_dict': None,
                'hyper_parameters': cfg.to_dict(),
                'epoch': None, 'iteration': 100, 'loss': 0.1},
               os.path.join(tdir, 'checkpoint.pt'))
    m_torch = run_validation(tdir, val_dir, val_loss_margin=5)

    variables, _ = load_reference_checkpoint(os.path.join(tdir,
                                                          'checkpoint.pt'))
    ndir = str(tmp_path / 'native_ckpt')
    os.makedirs(ndir)
    save_checkpoint(ndir, {'params': variables['params'],
                           'batch_stats': variables['batch_stats']},
                    cfg.to_dict(), epoch=0, iteration=100, loss=0.1)
    m_ours = run_validation(ndir, val_dir, val_loss_margin=5)

    for k in ('mse', 'badpix', 'kld', 'nll'):
        assert np.isfinite(m_torch[k]), k
        np.testing.assert_allclose(m_ours[k], m_torch[k], rtol=1e-5,
                                   err_msg=k)
