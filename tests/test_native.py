"""Native library tests: exact agreement with the numpy fallbacks."""

import time

import numpy as np
import pytest

from mmlf_tpu import native


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native library unavailable (no g++?)')
    return lib


def _numpy_texture_mask(center, wsize, threshold):
    """The pure-numpy reference path from ops/masks.py."""
    from mmlf_tpu.ops.masks import create_mask_margin_np
    h, w, c = center.shape
    r = wsize // 2
    padded = np.pad(center, ((r, r), (r, r), (0, 0)))
    acc = np.zeros((h, w), dtype=np.float32)
    for dy in range(wsize):
        for dx in range(wsize):
            acc += np.abs(padded[dy:dy + h, dx:dx + w] - center).sum(-1)
    mad = acc / float(wsize * wsize * c)
    mask = (mad >= threshold).astype(np.int32)
    return mask * create_mask_margin_np((h, w), r).astype(np.int32)


def test_texture_mask_matches_numpy(lib):
    rng = np.random.default_rng(0)
    center = rng.random((96, 80, 3), dtype=np.float32)
    center[20:40, 20:40] = 0.5   # a flat region
    got = native.texture_mask(center, 23, 0.02)
    want = _numpy_texture_mask(center, 23, 0.02)
    np.testing.assert_array_equal(got, want)


def test_texture_mask_faster_than_numpy(lib):
    rng = np.random.default_rng(1)
    center = rng.random((256, 256, 3), dtype=np.float32)
    t0 = time.time()
    native.texture_mask(center, 23, 0.02)
    t_native = time.time() - t0
    t0 = time.time()
    _numpy_texture_mask(center, 23, 0.02)
    t_numpy = time.time() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


@pytest.mark.parametrize('f', [1, 2, 3])
def test_strided_window_matches_numpy(lib, f):
    rng = np.random.default_rng(2)
    src = rng.random((9, 64, 64, 3), dtype=np.float32)
    win = 16
    ws_y, ws_x = 3, 5
    got = native.strided_window(src, ws_y, ws_x, f, win)
    want = src[:, ::f, ::f][:, ws_y:ws_y + win, ws_x:ws_x + win]
    np.testing.assert_array_equal(got, want)


def test_pipeline_uses_native_consistently(tmp_path):
    """Host pipeline output must be identical with and without native."""
    import os
    from mmlf_tpu.config import Config
    from mmlf_tpu.data import HCI4D
    from mmlf_tpu.data.pipeline import TrainPipeline
    from mmlf_tpu.data.synth import generate_dataset

    root = str(tmp_path / 'ds')
    generate_dataset(root, scenes=1, size=64, seed=0)
    cfg = Config(train_ps=32, train_max_downscale=1).finalize()

    ds = HCI4D(root, cache=True)
    a = TrainPipeline(ds, cfg, seed=5).sample_batch(2)

    os.environ['MMLF_TPU_NO_NATIVE'] = '1'
    try:
        native._TRIED = False
        native._LIB = None
        b = TrainPipeline(ds, cfg, seed=5).sample_batch(2)
    finally:
        del os.environ['MMLF_TPU_NO_NATIVE']
        native._TRIED = False
        native._LIB = None

    np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))
    np.testing.assert_array_equal(np.asarray(a.mpi), np.asarray(b.mpi))
    np.testing.assert_array_equal(np.asarray(a.gt), np.asarray(b.gt))
