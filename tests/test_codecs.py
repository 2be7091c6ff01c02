"""Codec and mask tests (reference semantics: mmlf/utils/dl.py:109-182)."""

import numpy as np

from mmlf_tpu.ops import codecs, masks


def test_reg_to_class_one_hot():
    arr = np.array([[[-3.5, 3.5, 0.033]]], dtype=np.float32)  # (1, 1, 3)
    out = np.asarray(codecs.reg_to_class(arr, -3.5, 3.5, 108))
    assert out.shape == (1, 1, 3, 108)
    # -3.5 maps to bin 0, 3.5 to bin 107; 0.033 sits within step/2 of bin 54
    assert out[0, 0, 0, 0] == 1 and out[0, 0, 0].sum() == 1
    assert out[0, 0, 1, 107] == 1 and out[0, 0, 1].sum() == 1
    assert out[0, 0, 2, 54] == 1 and out[0, 0, 2].sum() == 1


def test_reg_to_class_gap_quirk():
    """Reference quirk: bin pitch 7/107 exceeds the membership window 7/108,
    so some in-range values (e.g. 0.0) activate NO bin — preserved for parity
    (mmlf/utils/dl.py:125-129 divides step by n_steps, linspace by n-1)."""
    out = np.asarray(codecs.reg_to_class(
        np.zeros((1, 1, 1), np.float32), -3.5, 3.5, 108))
    assert out.sum() == 0


def test_reg_class_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.uniform(-3.4, 3.4, size=(2, 8, 8)).astype(np.float32)
    n = 108
    onehot = np.asarray(codecs.reg_to_class(arr, -3.5, 3.5, n))
    rec = np.asarray(codecs.class_to_reg(onehot, -3.5, 3.5, n))
    captured = onehot.sum(-1) > 0
    # most values are captured; gaps exist (see test_reg_to_class_gap_quirk)
    assert captured.mean() > 0.9
    # captured values reconstruct to within the membership radius step/2
    step = 7.0 / n
    assert np.abs(rec - arr)[captured].max() <= step / 2 + 1e-6


def test_out_of_range_is_all_zero():
    arr = np.array([[[5.0, -5.0]]], dtype=np.float32)
    out = np.asarray(codecs.reg_to_class(arr, -3.5, 3.5, 108))
    assert out.sum() == 0


def test_mpi_to_weights_matches_dense():
    rng = np.random.default_rng(1)
    b, k, h, w, n = 2, 3, 6, 5, 54
    mpi = np.zeros((b, k, h, w, 5), dtype=np.float32)
    mpi[..., 3] = rng.uniform(0, 1, (b, k, h, w))
    mpi[..., 4] = rng.uniform(-3.5, 3.5, (b, k, h, w))

    out = np.asarray(codecs.mpi_to_weights(mpi, -3.5, 3.5, n))
    assert out.shape == (b, h, w, n)

    # dense oracle
    step = 7.0 / n
    bins = np.linspace(-3.5, 3.5, n, dtype=np.float32)
    hot = (np.abs(bins[None, None, None, None]
                  - mpi[..., 4][..., None]) < step / 2)
    oracle = (hot * mpi[..., 3][..., None]).sum(1)
    np.testing.assert_allclose(out, oracle, atol=1e-6)


def test_mask_margin():
    m = np.asarray(masks.create_mask_margin((8, 10), 2))
    assert m.shape == (8, 10)
    assert m[2:-2, 2:-2].all()
    assert not m[:2].any() and not m[-2:].any()
    assert not m[:, :2].any() and not m[:, -2:].any()
    np.testing.assert_array_equal(m, masks.create_mask_margin_np((8, 10), 2))


def test_mask_margin_zero_is_all_true():
    assert np.asarray(masks.create_mask_margin((4, 4), 0)).all()


def test_texture_mask_flat_vs_textured():
    rng = np.random.default_rng(2)
    h = w = 64
    center = np.zeros((h, w, 3), dtype=np.float32)
    # left half flat, right half noisy
    center[:, w // 2:] = rng.uniform(0, 1, (h, w // 2, 3)).astype(np.float32)
    m = masks.create_mask_texture(center, wsize=23, threshold=0.02)
    assert m.shape == (h, w)
    # margin 11 masked
    assert m[:11].sum() == 0 and m[:, :11].sum() == 0
    # flat interior masked out, textured interior kept
    assert m[20:44, 12:20].sum() == 0
    assert m[20:44, 40:52].mean() > 0.9
