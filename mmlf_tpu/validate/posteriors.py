"""Posterior discretization + distribution metrics (KLD / NLL).

Jittable equivalents of the reference's validation helpers
(reference: mmlf/validate/cli.py:17-187), with the disparity-bin axis LAST
(``(..., S)``) instead of the reference's axis-1 — transposed only at the
artifact-save boundary.

Parity quirks preserved on purpose:
  * ``exp(logvar)`` is used as the Laplace *scale* everywhere
    (reference :19,31);
  * ``nll_discrete`` normalizes the posterior by ``sum * 7.0``
    (reference :57);
  * the ESE path passes *already-exponentiated* logvars into
    ``lmm_to_discrete``, which exponentiates again (reference :302,318) —
    the double-exp is kept so ESE KLD numbers are comparable.
Deviation: normalizations use ``keepdims`` so they are correct for any batch
size (the reference's ``kl_divergence`` relies on b == 1 broadcasting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5


def prob_laplace(disp, mean, logvar):
    """Laplace density of ``disp`` bins given per-pixel mean/logvar.

    :param disp: ``(..., S)`` bin grid (broadcastable)
    :param mean: ``(..., )`` per-pixel location
    :param logvar: per-pixel log of the Laplace scale
    """
    var = jnp.exp(logvar)[..., None]
    return jnp.exp(-jnp.abs(mean[..., None] - disp) / var) / var / 2.0


def cdf_laplace(disp, mean, var):
    """Laplace CDF (scale ``var``), elementwise."""
    lo = jnp.exp((disp - mean) / var) / 2.0
    hi = 1.0 - jnp.exp(-(disp - mean) / var) / 2.0
    return jnp.where(disp < mean, lo, hi)


def laplace_to_discrete(n_bins: int, x_min: float, x_max: float,
                        mean, logvar):
    """Integrate a Laplace posterior over ``n_bins`` equal bins.

    :returns: ``(..., n_bins)`` probabilities per bin
    """
    step = (x_max - x_min) / n_bins
    edges = jnp.linspace(x_min - step / 2.0, x_max + step / 2.0, n_bins + 1)
    var = jnp.exp(logvar)[..., None]
    cdf = cdf_laplace(edges, mean[..., None], var)
    return cdf[..., 1:] - cdf[..., :-1]


def lmm_to_discrete(n_bins: int, x_min: float, x_max: float,
                    means, logvars):
    """Discretize a Laplace mixture (ESE members).

    :param means: ``(K, ...)`` member means
    :param logvars: ``(K, ...)`` member "logvars" — the reference CLI passes
        exp(logvar) here and this function exponentiates again (quirk kept)
    """
    def body(acc, ml):
        m, lv = ml
        return acc + laplace_to_discrete(n_bins, x_min, x_max, m, lv), None
    init = jnp.zeros(means.shape[1:] + (n_bins,), jnp.float32)
    out, _ = jax.lax.scan(body, init, (means, logvars))
    return out / means.shape[0]


def mean_to_discrete(n_bins: int, x_min: float, x_max: float, mean):
    """One-hot discretization of a point estimate (BASE head)."""
    step = (x_max - x_min) / n_bins
    bins = jnp.linspace(x_min, x_max, n_bins)
    return (jnp.abs(bins - mean[..., None]) < step / 2.0).astype(jnp.float32)


def nll_laplace(mpi, mean, logvar, mask=None):
    """Laplace NLL of the MPI modes under the predicted distribution.

    :param mpi: ``(b, K, H, W, 5)``
    """
    disp = mpi[..., 4]                       # (b, K, H, W)
    alpha = mpi[..., 3]
    var = jnp.exp(logvar)[:, None]
    prob = jnp.exp(-jnp.abs(mean[:, None] - disp) / var) / var / 2.0 + EPS
    nllh = jnp.sum(alpha * -jnp.log(prob), axis=1)
    if mask is not None:
        return jnp.sum(nllh * mask) / jnp.sum(mask)
    return jnp.mean(nllh)


def nll_discrete(weights, posterior, mask=None):
    """Discrete NLL with the reference's ``/7.0`` normalization quirk.

    :param weights: ``(..., S)`` GT bin weights
    :param posterior: ``(..., S)`` predicted bin probabilities
    """
    weights = weights + EPS
    posterior = posterior + EPS
    weights = weights / jnp.sum(weights, -1, keepdims=True)
    posterior = posterior / (jnp.sum(posterior, -1, keepdims=True) * 7.0)
    nllh = jnp.sum(weights * -jnp.log(posterior), axis=-1)
    if mask is not None:
        return jnp.sum(nllh * mask) / jnp.sum(mask)
    return jnp.mean(nllh)


def likelihood_laplace(mpi, mean, logvar, mask):
    """Alpha-weighted likelihood of MPI modes (reference :137-155)."""
    disp = mpi[..., 4]
    alpha = mpi[..., 3]
    var = jnp.exp(logvar)[:, None]
    prob = jnp.exp(-jnp.abs(mean[:, None] - disp) / var) / var / 2.0 + EPS
    prob = prob / jnp.sum(prob, axis=1, keepdims=True)
    lh = jnp.sum(alpha * prob, axis=1) * mask
    return jnp.sum(lh) / jnp.sum(mask)


def multimodal_mask(mpi, threshold: float = 0.3):
    """1.0 where more than one MPI plane has alpha above ``threshold``."""
    alpha = mpi[..., 3]
    return (jnp.sum(alpha > threshold, axis=1) > 1).astype(jnp.float32)


def kl_divergence(dist, dist_gt, mask=None):
    """KL(gt || predicted) over the bin axis, optionally mask-averaged."""
    dist = dist + EPS
    dist_gt = dist_gt + EPS
    dist = dist / jnp.sum(dist, -1, keepdims=True)
    dist_gt = dist_gt / jnp.sum(dist_gt, -1, keepdims=True)
    kld = jnp.sum(dist_gt * jnp.log(dist_gt / dist), axis=-1)
    if mask is None:
        return jnp.mean(kld)
    return jnp.sum(kld * mask) / jnp.sum(mask)
