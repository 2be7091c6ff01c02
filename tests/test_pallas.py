"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mmlf_tpu.ops.pallas.posterior import (ensemble_posterior,
                                           laplace_mixture_posterior)


def _oracle(means, variances, bins):
    """Dense numpy mixture: (Kb, P)."""
    out = np.zeros((len(bins), means.shape[1]))
    for m, v in zip(means, variances):
        out += np.exp(-np.abs(bins[:, None] - m[None]) / v[None]) \
            / (2.0 * v[None])
    return out / means.shape[0]


def test_mixture_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    k, p, kb = 7, 300, 11        # p deliberately not a tile multiple
    means = rng.uniform(-3, 3, (k, p)).astype(np.float32)
    variances = rng.uniform(0.2, 2.0, (k, p)).astype(np.float32)
    bins = np.linspace(-3.5, 3.5, kb).astype(np.float32)

    got = np.asarray(laplace_mixture_posterior(
        jnp.asarray(means), jnp.asarray(variances), jnp.asarray(bins),
        interpret=True))
    want = _oracle(means, variances, bins)
    assert got.shape == (kb, p)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_ensemble_posterior_matches_scan_formulation():
    """The kernel must agree with the laplacian-accumulation the scan path
    uses (models/ensemble.py)."""
    from mmlf_tpu.models.feed_forward import laplacian
    from mmlf_tpu.ops.codecs import bin_centers

    rng = np.random.default_rng(1)
    k, b, h, w = 5, 1, 6, 8
    means = rng.uniform(-2, 2, (k, b, h, w)).astype(np.float32)
    logvars = rng.uniform(-1, 0.5, (k, b, h, w)).astype(np.float32)

    got = np.asarray(ensemble_posterior(
        jnp.asarray(means), jnp.asarray(logvars), -3.5, 3.5,
        interpret=True))

    bins = bin_centers(-3.5, 3.5, k)
    want = np.zeros((b, h, w, k), np.float32)
    for i in range(k):
        want += np.asarray(laplacian(bins, means[i], np.exp(logvars[i])))
    want /= k
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
