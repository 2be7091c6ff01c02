"""Analysis-suite tests: sparsification, clustering, mode counting, and the
multimodal metrics — vectorized implementations vs brute-force oracles."""

import numpy as np
import pytest

from mmlf_tpu.validate import sparsify as S
from mmlf_tpu.validate import cluster as C
from mmlf_tpu.validate import multimodal as MM
from mmlf_tpu.utils import modecnt as MC
from mmlf_tpu.utils import gmm_cnt as GC


def test_sparsification_curve_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 500
    gt = rng.normal(size=n)
    result = gt + rng.normal(size=n) * 0.1
    uncert = np.abs(result - gt) + rng.normal(size=n) * 0.02

    step = 0.1
    fr, oracle, unc = S.sparsification_curves(gt, result, uncert, step)

    # brute force: for each fraction keep the k best pixels and recompute
    error = np.abs(result - gt)
    for i, fract in enumerate(np.arange(0.0, 1.000000001, step)):
        if i == 0:
            continue
        k = n if fract >= 1.0 else int(fract * n)
        for curve, key in ((oracle, error), (unc, uncert)):
            idx = np.argsort(key)[:k]
            mask = np.zeros(n, bool)
            mask[idx] = True
            want = S.masked_mse(result, gt, mask)
            assert curve[i] == pytest.approx(want, rel=1e-6), (i, fract)

    # oracle curve is monotonically non-decreasing in kept fraction
    assert (np.diff(oracle[1:]) >= -1e-12).all()
    # oracle is never worse than the uncertainty ranking at any fraction
    assert (oracle[1:] <= unc[1:] + 1e-12).all()


def test_auc_trapezoid():
    assert S.auc([0.0, 1.0, 0.0], 0.5) == pytest.approx(0.5)


def test_kmeans_1d_separates_two_clusters():
    rng = np.random.default_rng(1)
    a = rng.normal(-2.0, 0.05, (40, 6))
    b = rng.normal(3.0, 0.05, (40, 7))
    samples = np.concatenate([a, b], axis=1)
    centers = C.kmeans_1d(samples, k=2)
    np.testing.assert_allclose(centers[:, 0], -2.0, atol=0.1)
    np.testing.assert_allclose(centers[:, 1], 3.0, atol=0.1)


def test_cluster_modes_flat_and_edge():
    gt = np.zeros((24, 24), np.float32)
    gt[:, 12:] = 2.0           # vertical depth edge
    modes = C.cluster_modes(gt, radius=2.0, k=2)
    # away from the edge: single mode
    assert modes[5, 3, 0] == modes[5, 3, 1] == 0.0
    assert modes[5, 20, 0] == modes[5, 20, 1] == 2.0
    # on the edge: both modes found
    edge_col = 12
    found = modes[12, edge_col]
    np.testing.assert_allclose(found, [0.0, 2.0], atol=0.2)


def test_modecnt_bimodal_pixel():
    s = 40
    post = np.zeros((s, 2, 2), np.float32)
    # pixel (0,0): two clear modes with a valley between (a tiny slope keeps
    # the valley a *strict* minimum — flat zeros have none, matching the
    # reference's strict comparisons)
    post[8, 0, 0] = 1.0
    post[28, 0, 0] = 0.7
    post[:, 0, 0] += np.linspace(0, 1e-4, s)
    # pixel (1,1): single mode
    post[20, 1, 1] = 1.0
    from scipy.ndimage import gaussian_filter1d
    post = gaussian_filter1d(post, sigma=2, axis=0)

    cnt, prop = MC.mode_analysis(post, outlier=0.1)
    assert cnt[0, 0] == 1.0
    assert cnt[1, 1] == 0.0
    assert prop[0, 0] > 1.0          # second mode well above the valley
    assert prop[1, 1] == 0.0


def test_posterior_local_maxima():
    p = np.array([[0.1], [0.5], [0.2], [0.8], [0.3]])[:, :, None]
    lm = MM.posterior_local_maxima(p)
    assert lm[1, 0, 0] == 0.5 and lm[3, 0, 0] == 0.8
    assert lm[0, 0, 0] == 0 and lm[2, 0, 0] == 0 and lm[4, 0, 0] == 0


def test_topk_mode_disparities_sorted():
    s = 108
    pm = np.zeros((s, 1, 1))
    pm[20] = 0.5
    pm[90] = 0.9
    disps = MM.topk_mode_disparities(pm, 2, -3.5, 3.5)
    assert disps.shape == (2, 1, 1)
    d0, d1 = disps[0, 0, 0], disps[1, 0, 0]
    assert d0 < d1
    assert d0 == pytest.approx(20 / 107 * 7.0 - 3.5, abs=1e-6)
    assert d1 == pytest.approx(90 / 107 * 7.0 - 3.5, abs=1e-6)


def test_gmm_count_modes():
    h = w = 4
    k = 2
    gmm = np.zeros((2, k, h, w), np.float32)
    gmm[0, 0] = -1.0    # means
    gmm[0, 1] = 1.5
    gmm[1] = 0.05       # variances
    cnts, lo, hi = GC.count_modes(gmm, -3.5, 3.5, 0.01)
    assert (cnts == 2).all()
    np.testing.assert_allclose(lo, -1.0, atol=0.02)
    np.testing.assert_allclose(hi, 1.5, atol=0.02)


def test_second_chance_improves():
    gt = np.array([[0.0, 1.0]])
    result = np.array([[0.9, 0.95]])
    lo = np.array([[0.05, -1.0]])
    hi = np.array([[2.0, 1.02]])
    best = GC.second_chance(result, gt, lo, hi)
    assert best[0, 0] == pytest.approx(0.05)   # lo closer to gt=0
    assert best[0, 1] == pytest.approx(1.02)   # hi beats 0.95? |1-1.02|<|1-0.95|
