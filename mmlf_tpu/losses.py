"""Masked loss library + BadPix metric.

Functional (jit-friendly) equivalents of the reference loss classes
(reference: mmlf/model/loss.py).  All losses take the model's output dict,
a target, and a mask; means are normalized by the mask count
(``sum(loss * mask) / sum(mask)``, falling back to the plain sum — which is
zero — when the mask is empty, reference :74-77).

Layout notes: targets/masks are ``(b, H, W)``; MPI targets are
``(b, K, H, W, 5)`` (alpha at [..., 3], disparity at [..., 4]); discrete
targets and scores are channel-last ``(b, H, W, S)``.

Parity quirks preserved:
  * ``masked_cross_entropy`` ReLUs the logits before the softmax
    cross-entropy with soft targets (reference :146-149);
  * the "improved" uncertainty losses add a ``-logvar`` out-of-range term and
    average the two renormalized terms (reference :271-285, :358-363).
Deviation: where the reference would divide by zero when an out-of-range
mask is empty (reference :361), we guard the scale to 0 instead of producing
NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def _masked_mean(values, mask):
    """sum(values * mask) / count, or the (zero) masked sum if count == 0."""
    mask_f = mask.astype(jnp.float32)
    count = jnp.sum(mask_f)
    total = jnp.sum(values * mask_f)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), total)


def masked_l1(output, target, mask):
    """L1 on masked pixels (reference MaskedL1Loss :29-77)."""
    return _masked_mean(jnp.abs(output['mean'] - target), mask)


def masked_mse(output, target, mask):
    """MSE on masked pixels (reference MaskedMSELoss :106-122)."""
    return _masked_mean((output['mean'] - target) ** 2.0, mask)


def masked_badpix(output, target, mask, t: float = 0.07):
    """BadPix(t) metric: fraction of masked pixels with |err| > t
    (reference MaskedBadPix :163-187)."""
    bad = (jnp.abs(output['mean'] - target) > t).astype(jnp.float32)
    return _masked_mean(bad, mask)


def multi_masked_l1(output, mpi, mask):
    """Alpha-weighted multi-plane L1 (reference MultiMaskedL1Loss :80-103).

    :param mpi: ``(b, K, H, W, 5)``
    """
    weights = mpi[..., 3]                       # (b, K, H, W)
    targets = mpi[..., 4]
    diff = jnp.abs(output['mean'][:, None] - targets) * weights
    return _masked_mean(jnp.sum(diff, axis=1), mask)


def multi_masked_mse(output, mpi, mask):
    raise NotImplementedError()  # parity: reference loss.py:134


def masked_cross_entropy(output, target, mask):
    """Softmax CE with soft targets on ReLU'd logits
    (reference MaskedCrossEntropy :137-160).

    Computed in log space (mathematically identical to the reference's
    ``-log(exp(sum(s*t)) / sum(exp(s)))``, numerically stable).

    :param target: ``(b, H, W, S)`` soft class weights
    """
    scores = jnp.maximum(output['scores'], 0.0)
    lse = logsumexp(scores, axis=-1)   # max-subtracted: no overflow at
    loss = lse - jnp.sum(scores * target, axis=-1)   # large logits
    return _masked_mean(loss, mask)


def uncertainty_mse(output, target, mask):
    """Kendall & Gal heteroscedastic MSE (reference UncertaintyMSELoss)."""
    loss = 0.5 * jnp.exp(-output['logvar']) * \
        (output['mean'] - target) ** 2.0
    loss = loss + 0.5 * output['logvar']
    return _masked_mean(loss, mask)


def multi_uncertainty_mse(output, mpi, mask):
    raise NotImplementedError()  # parity: reference loss.py:225


def logvar_anchor(output, target, mpi, mask, mask_padding=None,
                  multimodal=False, eps: float = 1e-6):
    """Calibration anchor for the uncertainty head (TPU extension, no
    reference counterpart; ``--train_logvar_anchor``).

    Quadratic pull of ``logvar`` toward ``log|err|`` with the error
    DETACHED: ``(logvar - stop_grad(log max(|mean - gt|, eps)))^2`` on
    in-range masked pixels.  ``exp(logvar) = |err|`` is already the
    pointwise optimum of the heteroscedastic L1 (d/dlogvar of
    ``exp(-logvar)|err| + logvar`` vanishes there), so the anchor adds no
    bias at the optimum — it only makes that optimum NON-TRADEABLE: the
    logvar head can neither run away (the collapse mode, where
    ``exp(-logvar)`` kills the data term) nor drift into a function of the
    input shift instead of its own error (the miscalibration mode that
    broke ESE min-logvar selection — docs/STATUS.md seed-0 completion).
    The stop_gradient keeps the mean head's own objective untouched.

    For the multimodal loss the per-pixel error is the alpha-weighted
    plane distance ``sum(w_k |mean - d_k|) / max(sum w_k, eps)``, and
    pixels with no supported plane (``sum w_k < 0.01``) are excluded —
    mirroring the main loss's in-range/out-of-range split.
    """
    logvar = output['logvar']
    if multimodal:
        weights = mpi[..., 3]
        dists = jnp.abs(output['mean'][:, None] - mpi[..., 4])
        wsum = jnp.sum(weights, axis=1)
        err = jnp.sum(dists * weights, axis=1) / jnp.maximum(wsum, eps)
        in_range = (wsum >= 0.01).astype(jnp.float32)
    else:
        err = jnp.abs(output['mean'] - target)
        in_range = (mask_padding.astype(jnp.float32)
                    if mask_padding is not None else 1.0)
    target_lv = jax.lax.stop_gradient(jnp.log(jnp.maximum(err, eps)))
    sq = (logvar - target_lv) ** 2.0
    return _masked_mean(sq, mask.astype(jnp.float32) * in_range)


def uncertainty_l1(output, target, mask):
    """Heteroscedastic L1 (reference UncertaintyL1Loss :228-251)."""
    loss = jnp.exp(-output['logvar']) * jnp.abs(output['mean'] - target)
    loss = loss + output['logvar']
    return _masked_mean(loss, mask)


def improved_uncertainty_l1(output, target, mask, mask_padding=None):
    """Heteroscedastic L1 with an out-of-range confidence term
    (reference ImprovedUncertaintyL1Loss :254-294).

    Where GT is absent (``mask_padding == 0``) the model is rewarded for high
    predicted variance via ``-logvar``; the in/out-of-range terms are each
    renormalized to the full pixel count and averaged.
    """
    loss = jnp.exp(-output['logvar']) * jnp.abs(output['mean'] - target)
    loss = loss + output['logvar']

    if mask_padding is not None:
        mp = mask_padding.astype(jnp.float32)
        numel = jnp.float32(mp.size)

        sum_in = jnp.sum(mp)
        loss = loss * mp * jnp.where(sum_in > 0, numel / jnp.maximum(sum_in, 1.0), 1.0)

        mask_oor = 1.0 - mp
        sum_oor = jnp.sum(mask_oor)
        loss_oor = -output['logvar'] * mask_oor * \
            jnp.where(sum_oor > 0, numel / jnp.maximum(sum_oor, 1.0), 0.0)

        loss = (loss + loss_oor) / 2.0

    return _masked_mean(loss, mask)


def multi_uncertainty_l1(output, mpi, mask):
    """Alpha-weighted heteroscedastic L1 (reference MultiUncertaintyL1Loss
    :297-333, minus its debug print)."""
    weights = mpi[..., 3]
    targets = mpi[..., 4]
    loss = jnp.exp(-output['logvar'])[:, None] * \
        jnp.abs(output['mean'][:, None] - targets)
    loss = loss + output['logvar'][:, None]
    loss = jnp.sum(loss * weights, axis=1)
    return _masked_mean(loss, mask)


def improved_multi_uncertainty_l1(output, mpi, mask, mask_padding=None):
    """Multimodal heteroscedastic L1 with out-of-range term
    (reference ImprovedMultiUncertaintyL1Loss :336-372).

    ``mask_padding`` is accepted for call-site parity but unused, like the
    reference.
    """
    weights = mpi[..., 3]
    targets = mpi[..., 4]
    loss = jnp.exp(-output['logvar'])[:, None] * \
        jnp.abs(output['mean'][:, None] - targets)
    loss = loss + output['logvar'][:, None]

    wsum = jnp.sum(weights, axis=1)                     # (b, H, W)
    loss = jnp.sum(loss * weights, axis=1) / jnp.mean(wsum)

    mask_oor = (wsum < 0.01).astype(jnp.float32)
    sum_oor = jnp.sum(mask_oor)
    numel = jnp.float32(mask_oor.size)
    # deviation: guard the empty-OOR case instead of NaN (reference :361)
    loss_oor = -output['logvar'] * mask_oor * \
        jnp.where(sum_oor > 0, numel / jnp.maximum(sum_oor, 1.0), 0.0)

    loss = (loss + loss_oor) / 2.0
    return _masked_mean(loss, mask)


def information_bottleneck(output, target, beta: float):
    """INN information-bottleneck loss (reference InformationBottleneckLoss
    :375-417), channel-last: ``dists``/``target`` are ``(b, H, W, K)``
    (the working INN path, models/inn.py).  The incoming ``jac`` is already
    normalized by ``dims·H·W`` in the INN forward and is divided again here
    — both divisions are reference quirks kept for parity
    (reference invertible.py:295-296 + loss.py:403).  The reference's
    ``mask`` argument is accepted nowhere because its loss ignores it
    (loss.py:389)."""
    beta_nll = 1.0 / (1.0 + beta)
    beta_cat_ce = beta / (1.0 + beta)

    zixels = output['zixels']
    jac = output['jac']
    mu = output['mu']
    dists = output['dists']

    h, w = zixels.shape[1], zixels.shape[2]
    dims = mu.shape[-1]

    jac = jac.reshape(-1, 1, 1) / (dims * w * h)
    nll = ((-logsumexp(-0.5 * dists, axis=-1)) - jac) / dims
    cat_ce = -jnp.sum(jax.nn.log_softmax(-0.5 * dists, axis=-1) * target,
                      axis=-1)
    return beta_nll * jnp.mean(nll) + beta_cat_ce * jnp.mean(cat_ce)
