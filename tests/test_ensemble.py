"""Shift-Ensemble (ESE) tests: scan vs the reference's Python-loop oracle."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.models import FeedForward
from mmlf_tpu.models.ensemble import ensemble_forward, ensemble_grid


SMALL = dict(model_chs=6, model_views=3, model_in_blocks=1,
             model_out_blocks=2, model_uncert=True)
GRID = dict(val_disp_min=-0.3, val_disp_max=0.3, val_disp_step=0.2)


def test_ensemble_grid_matches_arange():
    g = ensemble_grid(-3.5, 3.5, 0.1)
    assert len(g) == 70
    assert g[0] == pytest.approx(-3.5)
    assert g[-1] == pytest.approx(3.4, abs=1e-5)


def test_ensemble_selects_min_logvar_member():
    cfg = Config(**SMALL, **GRID).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((1, 3, 12, 12, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    apply_fn = lambda v, *s: model.apply(v, *s)

    out = ensemble_forward(apply_fn, variables, *stacks, **{
        'disp_min': GRID['val_disp_min'], 'disp_max': GRID['val_disp_max'],
        'disp_step': GRID['val_disp_step']})

    k = len(ensemble_grid(GRID['val_disp_min'], GRID['val_disp_max'],
                          GRID['val_disp_step']))
    assert out['means'].shape == (k, 1, 12, 12)
    assert out['posterior'].shape == (1, 12, 12, k)

    means = np.asarray(out['means'])
    logvars = np.asarray(out['logvars'])
    sel = logvars.argmin(0)
    np.testing.assert_allclose(
        np.asarray(out['mean']),
        np.take_along_axis(means, sel[None], 0)[0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out['logvar']),
        np.take_along_axis(logvars, sel[None], 0)[0], atol=1e-6)


def test_ensemble_vs_reference_oracle():
    """Full ESE parity: reference Ensamble(torch FF) vs our scanned ensemble
    with converted weights."""
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.feed_forward import FeedForward as TorchFF
    from mmlf.model.ensamble import Ensamble as TorchEns
    from mmlf_tpu.utils.convert import torch_state_to_flax

    cfg = Config(**SMALL, **GRID).finalize()
    tmodel = TorchFF(**cfg.to_dict())
    # input-sensitive weights (kaiming convs) — 0.1-scale weights left the
    # toy net input-dead and the comparison vacuous (see test_model.py)
    torch.manual_seed(0)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim == 4:
                torch.nn.init.kaiming_normal_(p)
            else:
                p.copy_(torch.randn_like(p) * 0.1)
    tmodel.eval()
    tens = TorchEns(tmodel, GRID['val_disp_min'], GRID['val_disp_max'],
                    GRID['val_disp_step'])

    rng = np.random.default_rng(1)
    stacks_np = [rng.random((1, 3, 12, 12, 3), dtype=np.float32)
                 for _ in range(4)]

    with torch.no_grad():
        tout = tens(*[torch.from_numpy(
            np.ascontiguousarray(np.transpose(s, (0, 1, 4, 2, 3))))
            for s in stacks_np])

    variables = torch_state_to_flax(
        tmodel.state_dict(), in_blocks=cfg.model_in_blocks,
        out_blocks=cfg.model_out_blocks)
    model = FeedForward.from_config(cfg)
    apply_fn = lambda v, *s: model.apply(v, *s)
    jout = ensemble_forward(
        apply_fn, variables, *[jnp.asarray(s) for s in stacks_np],
        disp_min=GRID['val_disp_min'], disp_max=GRID['val_disp_max'],
        disp_step=GRID['val_disp_step'])

    np.testing.assert_allclose(np.asarray(jout['means']),
                               tout['means'].numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(jout['logvars']),
                               tout['logvars'].numpy(), atol=5e-4)
    # NOTE: the min-logvar *selection* is not compared here — with random
    # weights the per-member logvars coincide to ~1e-6, so argmin parity is
    # pure float noise; the selection rule itself is covered by
    # test_ensemble_selects_min_logvar_member.
    # posterior: ours (b, H, W, K) vs reference (b, K, h, w)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jout['posterior']), (0, 3, 1, 2)),
        tout['posterior'].numpy(), atol=5e-4)
