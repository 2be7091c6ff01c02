"""Inference server (mmlf_tpu/serve.py): engine + HTTP surface against a
synthetic scene, in both checkpoint-dir and export-artifact modes."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.serve import InferenceEngine, make_server
from mmlf_tpu.train.loop import train


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('servetest')
    data = str(root / 'data')
    generate_dataset(data, scenes=1, size=64, seed=0)
    ckpt = str(root / 'run')
    os.makedirs(ckpt, exist_ok=True)
    cfg = Config(
        train_trainset=data, train_valset=data,
        train_bs=2, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=2, train_steps=2, model_chs=6, model_in_blocks=1,
        model_out_blocks=2, model_uncert=True, val_loss_margin=5,
    ).finalize()
    train(cfg, ckpt, progress=False)
    scene = os.path.join(data, sorted(os.listdir(data))[0])
    return root, ckpt, scene


def _request(port, method, path, payload=None):
    url = f'http://127.0.0.1:{port}{path}'
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope='module')
def server(env):
    root, ckpt, scene = env
    engine = InferenceEngine(ckpt)
    srv = make_server(engine, port=0)      # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], engine
    srv.shutdown()
    srv.server_close()


def test_healthz(server):
    port, _ = server
    code, resp = _request(port, 'GET', '/healthz')
    assert code == 200 and resp['status'] == 'ok'
    assert resp['model']['model_uncert'] is True


def test_infer_writes_artifacts_and_metrics(env, server, tmp_path):
    root, ckpt, scene = env
    port, _ = server
    out = str(tmp_path / 'out')
    code, resp = _request(port, 'POST', '/infer',
                          {'scene_dir': scene, 'out_dir': out})
    assert code == 200, resp
    assert resp['shape'] == [64, 64]
    assert np.isfinite(resp['mse'])           # synthetic scenes ship GT
    assert 0.0 <= resp['badpix_007'] <= 1.0
    assert os.path.exists(os.path.join(out, 'result.pfm'))
    assert os.path.exists(os.path.join(out, 'uncert.pfm'))

    from mmlf_tpu.utils import pfm
    res = np.flip(pfm.load(os.path.join(out, 'result.pfm')), 0)
    assert res.shape == (64, 64) and np.isfinite(res).all()

    code, stats = _request(port, 'GET', '/stats')
    assert code == 200 and stats['requests'] >= 1 and stats['errors'] == 0


def test_infer_bad_request(server):
    port, _ = server
    code, resp = _request(port, 'POST', '/infer',
                          {'scene_dir': '/nonexistent/scene'})
    assert code == 400 and 'error' in resp
    code, _ = _request(port, 'POST', '/nope')
    assert code == 404
    # non-object JSON bodies get a clean 400, not a dropped connection
    for body in ([1], 'x', 3, None, {}):
        code, resp = _request(port, 'POST', '/infer', body)
        assert code == 400 and 'error' in resp, body


def test_batched_artifact(env, tmp_path):
    """--batch 2 artifacts serve single scenes (padded) and scene lists."""
    root, ckpt, scene = env
    from mmlf_tpu.export import export_inference
    path = str(tmp_path / 'b2.mmlf')
    with open(path, 'wb') as f:
        f.write(export_inference(ckpt, 64, 64, batch=2, platforms=('cpu',)))

    engine = InferenceEngine(path)
    assert engine.warmup() == (64, 64)

    single = engine.infer(scene)
    assert single['shape'] == [64, 64] and np.isfinite(single['mse'])

    out = str(tmp_path / 'multi')
    multi = engine.infer(out_dir=out, scene_dirs=[scene, scene])
    assert len(multi['scenes']) == 2
    for r in multi['scenes']:
        np.testing.assert_allclose(r['mse'], single['mse'], rtol=1e-5)
        assert os.path.exists(r['artifacts'][0])
    # per-scene subdirs under out_dir
    assert os.path.dirname(multi['scenes'][0]['artifacts'][0]) == \
        os.path.join(out, multi['scenes'][0]['scene'])

    with pytest.raises(ValueError, match='artifact batch'):
        engine.infer(scene_dirs=[scene, scene, scene])

    # checkpoint-dir mode has no batch limit: jits at the request's batch
    ck = InferenceEngine(ckpt)
    multi_ck = ck.infer(scene_dirs=[scene, scene, scene])
    assert len(multi_ck['scenes']) == 3
    np.testing.assert_allclose(multi_ck['scenes'][0]['mse'],
                               single['mse'], rtol=1e-5)


def test_data_root_confinement(env):
    root, ckpt, scene = env
    engine = InferenceEngine(ckpt, data_root=str(root))
    assert np.isfinite(engine.infer(scene)['disp']['mean'])
    with pytest.raises(ValueError, match='outside --data_root'):
        engine.infer('/etc')
    with pytest.raises(ValueError, match='outside --data_root'):
        engine.infer(scene, out_dir='/tmp/elsewhere')


def test_artifact_mode_shape_guard(env, tmp_path):
    root, ckpt, scene = env
    from mmlf_tpu.export import export_inference
    path = str(tmp_path / 'm.mmlf')
    with open(path, 'wb') as f:
        f.write(export_inference(ckpt, 64, 64, platforms=('cpu',)))

    engine = InferenceEngine(path)
    assert engine.warmup() == (64, 64)
    resp = engine.infer(scene)
    assert resp['shape'] == [64, 64] and np.isfinite(resp['mse'])

    # a mismatched artifact refuses with a clear error
    path32 = str(tmp_path / 'm32.mmlf')
    with open(path32, 'wb') as f:
        f.write(export_inference(ckpt, 32, 32, platforms=('cpu',)))
    engine32 = InferenceEngine(path32)
    with pytest.raises(ValueError, match='specialized to'):
        engine32.infer(scene)


def test_u8_ingest_matches_fp32(env, tmp_path):
    """u8 artifacts (uint8 views + on-device normalize/shift) reproduce the
    fp32 path's metrics; checkpoint-dir --u8 mode agrees too."""
    root, ckpt, scene = env
    from mmlf_tpu.export import export_inference
    path = str(tmp_path / 'u8.mmlf')
    with open(path, 'wb') as f:
        f.write(export_inference(ckpt, 64, 64, platforms=('cpu',), u8=True))

    ref = InferenceEngine(ckpt).infer(scene, train_shift=1.5)

    eng = InferenceEngine(path)
    assert eng.u8 and eng.warmup() == (64, 64)
    out = str(tmp_path / 'out_u8')
    got = eng.infer(scene, out_dir=out, train_shift=1.5)
    # PNG-decoded views are exactly uint8/255 on both paths; the only
    # deltas are fp reassociation inside the two compiled programs
    np.testing.assert_allclose(got['mse'], ref['mse'], rtol=1e-4)
    np.testing.assert_allclose(got['badpix_007'], ref['badpix_007'],
                               atol=1e-6)
    assert os.path.exists(os.path.join(out, 'result.pfm'))

    ck = InferenceEngine(ckpt, u8=True)
    assert ck.u8
    got_ck = ck.infer(scene, train_shift=1.5)
    np.testing.assert_allclose(got_ck['mse'], ref['mse'], rtol=1e-4)

    # --u8 cannot retrofit an fp32 artifact — must fail loudly, not serve
    # silently at fp32 transfer cost
    fp32_path = str(tmp_path / 'fp32.mmlf')
    with open(fp32_path, 'wb') as f:
        f.write(export_inference(ckpt, 64, 64, platforms=('cpu',)))
    with pytest.raises(ValueError, match='not exported with --u8'):
        InferenceEngine(fp32_path, u8=True)


def test_train_shift_applied(env):
    """A nonzero shift re-centers the stacks — output must change."""
    root, ckpt, scene = env
    engine = InferenceEngine(ckpt)
    r0 = engine.infer(scene)
    r1 = engine.infer(scene, train_shift=1.0)
    assert r0['disp'] != r1['disp']


def test_healthz_ensemble_calibration_field(env):
    """Ensemble healthz must disclose calibration status: 'unchecked'
    without a report, the guard scores with one (VERDICT r3 item 8)."""
    root, ckpt, scene = env
    engine = InferenceEngine(ckpt, val_ensamble=True)
    srv = make_server(engine, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _request(srv.server_address[1], 'GET', '/healthz')
        assert code == 200 and body['val_ensamble']
        assert body['calibration']['status'] == 'unchecked'
    finally:
        srv.shutdown()
        srv.server_close()

    cal = str(root / 'cal.json')
    with open(cal, 'w') as f:
        json.dump({'rank_corr': 0.8, 'bare_mse': 0.1, 'ese_mse': 0.05,
                   'calibrated': True, 'member_offsets': None}, f)
    engine = InferenceEngine(ckpt, val_ensamble=True, calibration=cal)
    srv = make_server(engine, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _request(srv.server_address[1], 'GET', '/healthz')
        assert body['calibration']['calibrated'] is True
        assert body['calibration']['recalibrated'] is False
    finally:
        srv.shutdown()
        srv.server_close()


def test_nonloopback_requires_data_root(env):
    from click.testing import CliRunner
    from mmlf_tpu.serve import main
    root, ckpt, scene = env
    res = CliRunner().invoke(main, [ckpt, '--host', '0.0.0.0',
                                    '--no_warmup'])
    assert res.exit_code != 0
    assert 'data_root is required' in res.output
    # loopback still starts without confinement (construction only: the
    # engine builds, then we fail fast on a bad port bind)
    res = CliRunner().invoke(main, [ckpt, '--port', '-1', '--no_warmup'])
    assert 'data_root is required' not in str(res.output)


def test_tiled_artifact_serves_multiple_shapes(env, tmp_path):
    """A --tiled artifact accepts scenes of ANY shape through the server
    and matches the fixed-shape artifact's output (VERDICT r3 item 4)."""
    from mmlf_tpu.data.synth import generate_dataset as gen
    from mmlf_tpu.export import export_inference

    root, ckpt, scene = env
    data96 = str(root / 'data96')
    gen(data96, scenes=1, size=96, seed=3)
    scene96 = os.path.join(data96, sorted(os.listdir(data96))[0])

    art = str(tmp_path / 'tiled.mmlf')
    with open(art, 'wb') as f:
        f.write(export_inference(ckpt, 0, 0, platforms=('cpu',), tiled=32))
    engine = InferenceEngine(art)
    assert engine.fixed_shape is None and engine.tiled == 32

    r64 = engine.infer(scene_dir=scene, out_dir=str(tmp_path / 'o64'))
    r96 = engine.infer(scene_dir=scene96, out_dir=str(tmp_path / 'o96'))
    assert r64['shape'] == [64, 64] and r96['shape'] == [96, 96]

    # cross-check the 64² result against the fixed-shape artifact
    art64 = str(tmp_path / 'fixed.mmlf')
    with open(art64, 'wb') as f:
        f.write(export_inference(ckpt, 64, 64, platforms=('cpu',)))
    fixed = InferenceEngine(art64)
    rf = fixed.infer(scene_dir=scene)
    assert r64['mse'] == pytest.approx(rf['mse'], abs=1e-6)

    # scenes smaller than the tile window get a clear error
    with pytest.raises(ValueError, match='smaller than the tile window'):
        engine._tile_args([np.zeros((1, 9, 32, 32, 3), np.float32)] * 4,
                          32, 32)
