"""AOT export artifacts (mmlf_tpu/export.py): round-trip equality with the
direct eval path, ESE export, container format guards."""

import os

import numpy as np
import pytest
import jax

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.export import (build_inference, export_inference,
                             load_exported)
from mmlf_tpu.train.loop import train


@pytest.fixture(scope='module')
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp('exptest')
    data = str(root / 'data')
    generate_dataset(data, scenes=1, size=64, seed=0)
    out = str(root / 'run')
    os.makedirs(out, exist_ok=True)
    cfg = Config(
        train_trainset=data, train_valset=data,
        train_bs=2, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=2, train_steps=2, model_chs=6, model_in_blocks=1,
        model_out_blocks=2, model_uncert=True, val_loss_margin=5,
    ).finalize()
    train(cfg, out, progress=False)
    return out


def _stacks(size=64, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.rand(1, 9, size, size, 3).astype('f4') for _ in range(4)]


def test_export_round_trip_matches_direct(ckpt, tmp_path):
    path = str(tmp_path / 'upr.mmlf')
    blob = export_inference(ckpt, 64, 64, platforms=('cpu',))
    with open(path, 'wb') as f:
        f.write(blob)

    fn, meta = load_exported(path)
    assert meta['height'] == 64 and meta['config']['model_uncert']

    stacks = _stacks()
    out = fn(*stacks)
    assert sorted(out) == ['logvar', 'mean', 'posterior']

    fwd, variables, _ = build_inference(ckpt)
    ref = jax.jit(fwd)(variables, *stacks)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_export_ensemble(ckpt):
    blob = export_inference(ckpt, 32, 32, val_ensamble=True,
                            val_disp_step=1.0, platforms=('cpu',))
    fn, meta = load_exported(blob)
    assert meta['val_ensamble']
    out = fn(*_stacks(32))
    assert out['posterior'].shape == (1, 32, 32, 7)   # arange(-3.5,3.5,1)
    assert 'means' not in out                          # members dropped

    blob_m = export_inference(ckpt, 32, 32, val_ensamble=True,
                              val_disp_step=1.0, members=True,
                              platforms=('cpu',))
    fn_m, _ = load_exported(blob_m)
    out_m = fn_m(*_stacks(32))
    assert out_m['means'].shape == (7, 1, 32, 32)

    fwd, variables, _ = build_inference(ckpt, val_ensamble=True,
                                        val_disp_step=1.0)
    ref = jax.jit(fwd)(variables, *_stacks(32))
    np.testing.assert_array_equal(np.asarray(out['mean']),
                                  np.asarray(ref['mean']))


def test_export_u8_matches_host_path(ckpt):
    """u8 ingest (uint8 stacks + on-device /255 + shift) equals the fp32
    artifact fed host-normalized, host-shifted views."""
    from mmlf_tpu.data.transforms import np_shift_lf

    rng = np.random.RandomState(3)
    u8_stacks = [rng.randint(0, 256, (9, 64, 64, 3), dtype=np.uint8)
                 for _ in range(4)]
    shift = 0.75

    fn_u8, meta = load_exported(
        export_inference(ckpt, 64, 64, platforms=('cpu',), u8=True))
    assert meta['u8'] is True
    out_u8 = fn_u8(*(s[None] for s in u8_stacks), np.float32(shift))

    f32 = [s.astype(np.float32) / 255.0 for s in u8_stacks]
    fn_f32, _ = load_exported(
        export_inference(ckpt, 64, 64, platforms=('cpu',)))
    out_f32 = fn_f32(*(s[None] for s in np_shift_lf(*f32, shift)))

    assert sorted(out_u8) == sorted(out_f32)
    for k in out_f32:
        np.testing.assert_allclose(np.asarray(out_u8[k]),
                                   np.asarray(out_f32[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_export_u8_ensemble_matches_fp32(ckpt):
    """The u8 ingest composes with the shift ensemble: uint8 + on-device
    normalize/re-center + member scan equals the fp32 ensemble artifact."""
    from mmlf_tpu.data.transforms import np_shift_lf

    rng = np.random.RandomState(7)
    u8s = [rng.randint(0, 256, (9, 32, 32, 3), dtype=np.uint8)
           for _ in range(4)]
    shift = 1.25

    fn_u8, meta = load_exported(
        export_inference(ckpt, 32, 32, platforms=('cpu',), u8=True,
                         val_ensamble=True, val_disp_step=1.0))
    assert meta['u8'] and meta['val_ensamble']
    o_u8 = fn_u8(*(s[None] for s in u8s), np.float32(shift))

    f32 = [s.astype(np.float32) / 255.0 for s in u8s]
    fn_f, _ = load_exported(
        export_inference(ckpt, 32, 32, platforms=('cpu',),
                         val_ensamble=True, val_disp_step=1.0))
    o_f = fn_f(*(s[None] for s in np_shift_lf(*f32, shift)))
    for k in o_f:
        np.testing.assert_allclose(np.asarray(o_u8[k]), np.asarray(o_f[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_export_inn(tmp_path):
    """A trained --model_inn checkpoint exports and round-trips too."""
    data = str(tmp_path / 'data')
    generate_dataset(data, scenes=1, size=64, seed=0)
    out = str(tmp_path / 'run_inn')
    os.makedirs(out)
    cfg = Config(
        train_trainset=data, train_valset=data,
        train_bs=2, train_ps=32, train_lr=1e-4, train_max_downscale=1,
        val_interval=2, train_steps=2, val_loss_margin=5,
        model_views=9, model_in_blocks=1, model_out_blocks=1,
        model_inn=True).finalize()
    train(cfg, out, progress=False)

    fn, meta = load_exported(export_inference(out, 32, 32,
                                              platforms=('cpu',)))
    o = fn(*_stacks(32))
    assert o['posterior'].shape[-1] == 108
    fwd, variables, _ = build_inference(out)
    ref = jax.jit(fwd)(variables, *_stacks(32))
    np.testing.assert_array_equal(np.asarray(o['mean']),
                                  np.asarray(ref['mean']))

    # the u8 ingest wrapper composes with the INN program too
    fn_u8, meta_u8 = load_exported(export_inference(
        out, 32, 32, platforms=('cpu',), u8=True))
    assert meta_u8['u8']
    rng = np.random.RandomState(5)
    u8s = [rng.randint(0, 256, (1, 9, 32, 32, 3), dtype=np.uint8)
           for _ in range(4)]
    o_u8 = fn_u8(*u8s, np.float32(0.0))
    ref_u8 = fn(*(s.astype(np.float32) / 255.0 for s in u8s))
    np.testing.assert_allclose(np.asarray(o_u8['mean']),
                               np.asarray(ref_u8['mean']),
                               rtol=1e-5, atol=1e-5)


def test_inn_ensemble_rejected_as_value_error(tmp_path):
    """Library callers (serve engine) get ValueError, not a click type."""
    data = str(tmp_path / 'data')
    generate_dataset(data, scenes=1, size=64, seed=0)
    out = str(tmp_path / 'run_inn')
    os.makedirs(out)
    cfg = Config(
        train_trainset=data, train_valset=data,
        train_bs=2, train_ps=32, train_lr=1e-4, train_max_downscale=1,
        val_interval=2, train_steps=2, val_loss_margin=5,
        model_views=9, model_in_blocks=1, model_out_blocks=1,
        model_inn=True).finalize()
    train(cfg, out, progress=False)
    with pytest.raises(ValueError, match='val_ensamble does not apply'):
        build_inference(out, val_ensamble=True)


def test_bad_artifact_rejected(tmp_path):
    p = str(tmp_path / 'junk.bin')
    with open(p, 'wb') as f:
        f.write(b'not an artifact at all')
    with pytest.raises(ValueError, match='not an mmlf_tpu export'):
        load_exported(p)


def test_export_cli(ckpt, tmp_path):
    from click.testing import CliRunner
    from mmlf_tpu.export import main
    path = str(tmp_path / 'cli.mmlf')
    res = CliRunner().invoke(main, [ckpt, path, '--height', '32',
                                    '--width', '32', '--platforms', 'cpu'])
    assert res.exit_code == 0, res.output
    fn, meta = load_exported(path)
    out = fn(*_stacks(32))
    assert np.isfinite(np.asarray(out['mean'])).all()


def test_export_with_calibration(ckpt):
    """--calibration: scores land in meta, member offsets are baked into
    the ensemble program (constant offset -> same selection, logvar
    lowered by exactly the offset)."""
    cal = {'rank_corr': 0.81, 'bare_mse': 0.1, 'ese_mse': 0.05,
           'calibrated': True, 'member_offsets': [1.0] * 7}
    blob = export_inference(ckpt, 32, 32, val_ensamble=True,
                            val_disp_step=1.0, platforms=('cpu',),
                            calibration=cal)
    fn, meta = load_exported(blob)
    assert meta['calibration']['recalibrated'] is True
    assert meta['calibration']['rank_corr'] == pytest.approx(0.81)

    blob0 = export_inference(ckpt, 32, 32, val_ensamble=True,
                             val_disp_step=1.0, platforms=('cpu',))
    fn0, meta0 = load_exported(blob0)
    assert meta0['calibration'] is None    # exported unchecked

    s = _stacks(32)
    out, out0 = fn(*s), fn0(*s)
    np.testing.assert_array_equal(np.asarray(out['mean']),
                                  np.asarray(out0['mean']))
    np.testing.assert_allclose(np.asarray(out['logvar']),
                               np.asarray(out0['logvar']) - 1.0, atol=1e-6)


def test_export_calibration_requires_ensemble(ckpt):
    with pytest.raises(ValueError, match='only apply to an ensemble'):
        export_inference(ckpt, 32, 32, platforms=('cpu',),
                         calibration={'member_offsets': [1.0] * 7})


def test_export_tiled_shape_polymorphic(ckpt, tmp_path):
    """--tiled: ONE symbolic-canvas artifact serves multiple scene shapes,
    matching the full-scene forward (VERDICT r3 item 4)."""
    from mmlf_tpu.validate.tiling import tile_positions

    blob = export_inference(ckpt, 0, 0, platforms=('cpu',), tiled=32)
    fn, meta = load_exported(blob)
    assert meta['tiled'] == 32 and 'height' not in meta
    halo = meta['halo']
    assert meta['sdim']['mean'] == 1

    fwd, variables, _ = build_inference(ckpt)
    full = jax.jit(fwd)

    for (ht, wt) in [(64, 64), (96, 64)]:
        stacks = [s[:, :, :ht, :wt] for s in _stacks(96, seed=3)]
        hc, wc = -(-ht // 32) * 32, -(-wt // 32) * 32
        smin = max(2, -(-(32 + 2 * halo) // 32)) * 32
        hc, wc = max(hc, smin), max(wc, smin)
        padded = [np.pad(s, ((0, 0), (0, 0), (0, hc - ht), (0, wc - wt),
                             (0, 0))) for s in stacks]
        pos = tile_positions(ht, wt, 32, halo,
                             pad_to=(hc // 32) * (wc // 32))
        out = fn(*padded, pos.astype(np.int32))
        ref = full(variables, *stacks)
        np.testing.assert_allclose(
            np.asarray(out['mean'])[:, :ht, :wt],
            np.asarray(ref['mean']), atol=2e-5,
            err_msg=f'{ht}x{wt}')


def test_export_tiled_batch_guard(ckpt):
    with pytest.raises(ValueError, match='batch=1 only'):
        export_inference(ckpt, 0, 0, platforms=('cpu',), tiled=32, batch=2)
