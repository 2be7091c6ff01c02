"""ESE logvar-calibration guard + post-hoc recalibration
(mmlf_tpu/validate/calibrate.py; VERDICT r3 item 1)."""

import json
import os

import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.train.loop import train
from mmlf_tpu.validate import calibrate as C
from mmlf_tpu.validate.cli import run_validation


def test_member_rank_corr_extremes():
    rng = np.random.default_rng(0)
    errs = rng.uniform(0.1, 2.0, (7, 4, 4)).astype(np.float32)
    # logvar = monotone function of err -> perfect rank correlation
    corr = C.member_rank_corr(np.log(errs), errs)
    assert np.allclose(corr, 1.0, atol=1e-5)
    corr = C.member_rank_corr(-np.log(errs), errs)
    assert np.allclose(corr, -1.0, atol=1e-5)


def test_scene_calibration_bare_member():
    shifts = np.array([-1.0, 0.0, 1.0], np.float32)
    gt = np.zeros((4, 4), np.float32)
    means = np.stack([gt + 0.5, gt + 0.1, gt + 0.9])
    logvars = np.log(np.abs(means - gt) + 1e-6)
    mask = np.ones((4, 4), bool)
    s = C.scene_calibration(shifts, means, logvars, gt, mask)
    assert s['bare_mse'] == pytest.approx(0.01, rel=1e-4)
    assert s['rank_corr'] == pytest.approx(1.0, abs=1e-5)

    # no zero-shift member -> no bare reference
    s2 = C.scene_calibration(shifts + 0.25, means, logvars, gt, mask)
    assert s2['bare_mse'] is None


def test_bare_member_detected_on_default_arange_grid():
    """The reference-default grid arange(-3.5, 3.5, 0.1) carries ~3e-6 of
    float32 accumulation error at its zero member; the bare-model check
    must still fire (round-5 regression: it silently vanished as 'n/a')."""
    from mmlf_tpu.models.ensemble import ensemble_grid
    shifts = ensemble_grid(-3.5, 3.5, 0.1)
    K = len(shifts)
    gt = np.zeros((3, 3), np.float32)
    means = np.tile(gt, (K, 1, 1)) + 0.2
    logvars = np.zeros((K, 3, 3), np.float32)
    s = C.scene_calibration(shifts, means, logvars, gt,
                            np.ones((3, 3), bool))
    assert s['bare_mse'] == pytest.approx(0.04, rel=1e-4)


def test_calibration_report_warnings():
    healthy = [{'rank_corr': 0.8, 'bare_mse': 0.1}]
    rep = C.calibration_report(healthy, ese_mse=0.05)
    assert rep['calibrated'] and not rep['warnings']

    # the broken-arm signature: low rank correlation AND ESE worse than
    # the bare model (docs/STATUS.md upr70_s0w: corr +0.29, 0.055 -> 0.66)
    broken = [{'rank_corr': 0.29, 'bare_mse': 0.055}]
    rep = C.calibration_report(broken, ese_mse=0.66)
    assert not rep['calibrated']
    assert len(rep['warnings']) == 2
    assert 'rank correlation' in rep['warnings'][0]
    assert 'actively harmful' in rep['warnings'][1]


def test_fit_member_offsets_recovers_bias_and_repairs_selection():
    """Members whose logvar carries a per-member (= per-shift) systematic
    bias mis-select; the fitted offsets remove exactly that bias."""
    rng = np.random.default_rng(1)
    K, H, W = 8, 16, 16
    gt = rng.uniform(-1, 1, (H, W)).astype(np.float32)
    errs = rng.uniform(0.05, 0.5, (K, H, W)).astype(np.float32)
    signs = rng.choice([-1.0, 1.0], (K, H, W))
    means = gt[None] + errs * signs
    bias = np.linspace(2.0, -2.0, K).astype(np.float32)  # monotone in k,
    # like the shift-tracking failure arm (docs/STATUS.md)
    logvars = np.log(errs) + bias[:, None, None]
    mask = np.ones((H, W), bool)

    offsets = C.fit_member_offsets([(means, logvars, gt, mask)])
    # offsets recover the injected bias up to a small per-member residual
    # (mean-of-log vs log-of-mean of the random errors)
    assert np.allclose(np.diff(offsets), np.diff(bias), atol=0.15)

    def select_mse(lvs):
        sel = np.take_along_axis(means, lvs.argmin(0)[None], 0)[0]
        return float(((sel - gt) ** 2).mean())

    biased = select_mse(logvars)
    repaired = select_mse(logvars - offsets[:, None, None])
    oracle = float((np.min(np.abs(means - gt[None]), 0) ** 2).mean())
    assert repaired < biased * 0.5          # selection substantially fixed
    # after offsets, logvar = log|err| + small per-member residual (the
    # mean-of-log vs log-of-mean gap), so argmin ~= min-error
    assert repaired < oracle * 1.05


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('caltest')
    train_dir = str(root / 'train')
    val_dir = str(root / 'val')
    generate_dataset(train_dir, scenes=1, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=5)

    out = str(root / 'run_uncert')
    os.makedirs(out, exist_ok=True)
    cfg = Config(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=2, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=2, train_steps=2, model_chs=6, model_in_blocks=1,
        model_out_blocks=2, model_uncert=True, val_loss_margin=5,
    ).finalize()
    train(cfg, out, progress=False)
    return root, train_dir, val_dir, out


def test_validate_emits_calibration_report(env):
    root, train_dir, val_dir, out = env
    metrics = run_validation(out, val_dir, val_loss_margin=5,
                             val_ensamble=True, val_disp_step=0.5)
    rep = metrics['ese_calibration']
    assert np.isfinite(rep['rank_corr'])
    assert rep['bare_mse'] is not None      # step 0.5 grid contains 0.0
    assert rep['ese_mse'] == pytest.approx(metrics['mse'])
    assert isinstance(rep['calibrated'], bool)


def test_validate_recalibrate_and_save(env, capsys):
    root, train_dir, val_dir, out = env
    cal_json = str(root / 'calibration.json')
    metrics = run_validation(out, val_dir, val_loss_margin=5,
                             val_ensamble=True, val_disp_step=0.5,
                             val_recalibrate=train_dir,
                             val_save_calibration=cal_json)
    assert np.isfinite(metrics['mse'])
    payload = json.load(open(cal_json))
    assert payload['member_offsets'] is not None
    assert len(payload['member_offsets']) == 14   # arange(-3.5,3.5,.5)
    assert payload['val_disp_step'] == 0.5
    outtxt = capsys.readouterr().out
    assert 'Fitted member logvar offsets' in outtxt
    assert '(recalibrated)' in outtxt


def test_validate_recalibrate_under_mesh_ensemble(env, capsys):
    """VERDICT r4 weak #4 lifted: --val_recalibrate composes with
    --mesh_ensemble — the traced offsets ride the shard_map — and fits the
    SAME offsets as the plain path (the member math is identical, only
    sharded)."""
    root, train_dir, val_dir, out = env
    plain = str(root / 'cal_plain.json')
    run_validation(out, val_dir, val_loss_margin=5, val_ensamble=True,
                   val_disp_step=0.5, val_recalibrate=train_dir,
                   val_save_calibration=plain)
    meshed = str(root / 'cal_mesh.json')
    metrics = run_validation(out, val_dir, val_loss_margin=5,
                             val_ensamble=True, val_disp_step=0.5,
                             mesh_ensemble=2, val_recalibrate=train_dir,
                             val_save_calibration=meshed)
    assert np.isfinite(metrics['mse'])
    a = np.asarray(json.load(open(plain))['member_offsets'])
    b = np.asarray(json.load(open(meshed))['member_offsets'])
    assert np.allclose(a, b, atol=1e-4)
    assert '(recalibrated)' in capsys.readouterr().out


def test_validate_recalibrate_under_val_tile(env, capsys):
    """VERDICT r4 weak #4 lifted: --val_recalibrate composes with
    --val_tile — offsets travel as part of the (variables, offsets) pytree
    of the canvas program.  The tiled ensemble differs from the plain one
    only where the sub-pixel wrap lands (halo vs image border), so fitted
    offsets and metrics stay close, not bit-equal."""
    root, train_dir, val_dir, out = env
    cal_json = str(root / 'cal_tile.json')
    metrics = run_validation(out, val_dir, val_loss_margin=5,
                             val_ensamble=True, val_disp_step=0.5,
                             val_tile=32, val_recalibrate=train_dir,
                             val_save_calibration=cal_json)
    assert np.isfinite(metrics['mse'])
    payload = json.load(open(cal_json))
    offs = np.asarray(payload['member_offsets'])
    assert offs.shape == (14,) and np.all(np.isfinite(offs))
    plain = json.load(open(str(root / 'cal_plain.json')))
    assert np.allclose(offs, np.asarray(plain['member_offsets']), atol=0.3)
    assert '(recalibrated)' in capsys.readouterr().out
