"""bench.py driver contract: ONE JSON line with the required schema,
and the stale-replay path when the TPU never comes up.

bench.py is a repo-root script (not a package module); load it by path.
"""

import importlib.util
import io
import json
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED_KEYS = {'metric', 'value', 'unit', 'vs_baseline',
                 'vs_baseline_flop_scaled', 'value_synced', 'value_chs70',
                 'vs_baseline_chs70', 'value_bs512_recipe',
                 'ms_per_step_bs512', 'mfu', 'mfu_chs70', 'config'}


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        'bench_under_test', os.path.join(ROOT, 'bench.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _capture_stdout(fn):
    out, old = io.StringIO(), sys.stdout
    sys.stdout = out
    try:
        fn()
    finally:
        sys.stdout = old
    return out.getvalue()


def test_emit_schema(bench):
    text = _capture_stdout(lambda: bench.emit(506.3, 418.8, 376.4, 507.4))
    lines = [l for l in text.strip().splitlines() if l]
    assert len(lines) == 1, 'driver contract: exactly ONE stdout line'
    rec = json.loads(lines[0])
    assert REQUIRED_KEYS <= set(rec), REQUIRED_KEYS - set(rec)
    assert rec['metric'] == 'train_patches_per_sec_per_chip'
    assert rec['value'] == 506.3 and 'stale' not in rec
    # derived fields recompute from the raw rates
    assert rec['ms_per_step_bs512'] == pytest.approx(512000.0 / 507.4, 0.01)
    assert 0.0 < rec['mfu'] < 1.0 and 0.0 < rec['mfu_chs70'] < 1.0


def test_stale_replay(bench, tmp_path, monkeypatch):
    cache = {'pps': 100.0, 'pps_sync': 90.0, 'pps70': 80.0,
             'pps512': 110.0, 'measured_at': '2026-08-17T19:15:00Z'}
    cache_path = tmp_path / 'cache.json'
    cache_path.write_text(json.dumps(cache))
    monkeypatch.setattr(bench, 'CACHE_PATH', str(cache_path))
    monkeypatch.setattr(
        bench, '_acquire_devices',
        lambda max_wait_s: (_ for _ in ()).throw(RuntimeError('down')))
    exited = {}
    monkeypatch.setattr(bench.os, '_exit', lambda c: exited.update(code=c))

    text = _capture_stdout(bench.main)
    rec = json.loads(text.strip().splitlines()[0])
    assert rec['stale'] is True and rec['measured_at'] == cache['measured_at']
    assert rec['value'] == 100.0 and REQUIRED_KEYS <= set(rec)
    assert exited.get('code') == 0


def test_conv_flops_reference_values(bench):
    # pins the corrected FLOP accounting (round-3 fix: the last out-block
    # projects at conv1) so MFU numbers stay comparable across rounds
    assert bench.conv_flops_per_patch(64) / 1e9 == pytest.approx(224.5, 0.01)
    assert bench.conv_flops_per_patch(70) / 1e9 == pytest.approx(268.4, 0.01)
    # monotone in width, and bwd≈3x-fwd accounting keeps the ratio sane
    assert bench.conv_flops_per_patch(70) > bench.conv_flops_per_patch(64)


def test_acquire_devices_deadline(bench, monkeypatch):
    calls = {'n': 0}

    def fake_devices():
        calls['n'] += 1
        raise RuntimeError('UNAVAILABLE')

    import types
    fake_jax = types.ModuleType('jax')
    fake_jax.devices = fake_devices
    ext = types.ModuleType('jax.extend')
    be = types.ModuleType('jax.extend.backend')
    be.clear_backends = lambda: None
    monkeypatch.setitem(sys.modules, 'jax', fake_jax)
    monkeypatch.setitem(sys.modules, 'jax.extend', ext)
    monkeypatch.setitem(sys.modules, 'jax.extend.backend', be)

    with pytest.raises(RuntimeError, match='no TPU device'):
        bench._acquire_devices(max_wait_s=0.5)
    assert calls['n'] >= 1


def test_watchdog_emits_stale_within_budget(bench, tmp_path, monkeypatch):
    """VERDICT r4 missing #1: a slow-but-running bench under an external
    timeout must still land a JSON line — the internal budget watchdog
    replays the cache (marked stale) and exits before the driver's kill."""
    import time
    cache = {'pps': 100.0, 'pps_sync': 90.0, 'pps70': 80.0,
             'pps512': 110.0, 'measured_at': '2026-08-20T09:30:00Z'}
    cache_path = tmp_path / 'cache.json'
    cache_path.write_text(json.dumps(cache))
    monkeypatch.setattr(bench, 'CACHE_PATH', str(cache_path))
    monkeypatch.setattr(bench, 'BUDGET_S', 0.1)
    exited = {}
    monkeypatch.setattr(bench.os, '_exit', lambda c: exited.update(code=c))

    def run():
        t = bench._arm_watchdog(time.time())
        t.join(5.0)

    text = _capture_stdout(run)
    lines = [l for l in text.strip().splitlines() if l]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec['stale'] is True and 'budget' in rec['stale_reason']
    assert rec['value'] == 100.0 and REQUIRED_KEYS <= set(rec)
    assert exited.get('code') == 0


def test_watchdog_cancelled_by_emission(bench, monkeypatch):
    """Once the real record is emitted, the watchdog must do nothing."""
    import time
    monkeypatch.setattr(bench, 'BUDGET_S', 0.1)
    exited = {}
    monkeypatch.setattr(bench.os, '_exit', lambda c: exited.update(code=c))

    def run():
        t = bench._arm_watchdog(time.time())
        assert bench._emit_once(
            lambda: bench.emit(506.3, 418.8, 376.4, 507.4))
        t.join(5.0)

    text = _capture_stdout(run)
    lines = [l for l in text.strip().splitlines() if l]
    assert len(lines) == 1, 'watchdog must not double-emit'
    assert 'stale' not in json.loads(lines[0])
    assert 'code' not in exited


def test_emit_once_is_single_shot(bench):
    text = _capture_stdout(lambda: (
        bench._emit_once(lambda: bench.emit(506.3, 418.8, 376.4, 507.4)),
        bench._emit_once(lambda: bench.emit(1.0, 1.0, 1.0, 1.0))))
    lines = [l for l in text.strip().splitlines() if l]
    assert len(lines) == 1, 'driver contract: exactly ONE stdout line'
    assert json.loads(lines[0])['value'] == 506.3


def test_write_cache_trailing_newline(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, 'CACHE_PATH', str(tmp_path / 'c.json'))
    bench._write_cache({'pps': 1.0, 'pps_sync': 1.0, 'pps70': 1.0,
                        'pps512': 1.0, 'splits': None})
    raw = (tmp_path / 'c.json').read_text()
    assert raw.endswith('\n')
    assert 'measured_at' in json.loads(raw)


def test_step_split_cpu_smoke(bench, tmp_path, monkeypatch):
    """The split leg broke silently twice (r4: dataset-regen race, then a
    64MB-readback sync artifact) — drive it end to end at a tiny config so
    API breakage surfaces in CI, not in the next hardware bench."""
    from mmlf_tpu.data.synth import generate_dataset
    d = str(tmp_path / 'scenes')
    generate_dataset(d, scenes=1, size=160, seed=0)
    monkeypatch.setattr(bench, 'ensure_data', lambda: d)
    split = bench.step_split({'model_chs': 6, 'model_in_blocks': 1,
                              'model_out_blocks': 2}, 2, n=1, label='t')
    assert set(split) == {'fwd_bwd', 'fwd', 'gather_augment', 'adam'}
    assert all(v > 0 for v in split.values())
    # the sync is a device-side reduction: no row may carry a multi-second
    # readback penalty at this size (the r4 artifact was ~16,000 ms)
    assert split['gather_augment'] < 5000


def test_emit_new_round4_fields(bench):
    splits = {'split_ms': {'fwd_bwd': 263.0, 'fwd': 92.2,
                           'gather_augment': 91.4, 'adam': 41.1},
              'split_ms_chs70': {'fwd_bwd': 345.0, 'fwd': 120.5,
                                 'gather_augment': 81.7, 'adam': 34.0}}
    text = _capture_stdout(lambda: bench.emit(
        506.3, 418.8, 376.4, 507.4, pps70_sync=330.0, splits=splits))
    rec = json.loads(text.strip().splitlines()[0])
    assert rec['value_chs70_synced'] == 330.0
    assert rec['split_ms']['fwd_bwd'] == 263.0
    assert rec['split_ms_chs70']['adam'] == 34.0
    # absent on old caches: emit must not require them (stale replay)
    text = _capture_stdout(lambda: bench.emit(506.3, 418.8, 376.4, 507.4))
    rec = json.loads(text.strip().splitlines()[0])
    assert 'value_chs70_synced' not in rec and 'split_ms' not in rec
