"""ESE logvar-calibration guard + post-hoc per-member recalibration.

The shift ensemble's min-logvar member selection (reference
mmlf/model/ensamble.py:82-86) silently breaks when the UPR logvar head is
miscalibrated — two measured failure modes (docs/STATUS.md): the logvar
collapse (ESE MSE×100 2.5 → 205) and the warmup-armed run whose logvar
learned the trunk-input shift instead of its own error (2.7 → 80.8 while
the MEAN head improved).  Neither is visible in the UPR metrics, so the
validate CLI must check calibration itself whenever it evaluates an
ensemble:

* **rank correlation** — per-pixel Spearman correlation between member
  logvar and member |error| across the shift grid.  Selection can only
  work if logvar orders members the way error does; the healthy reference
  checkpoint scores +0.80, the broken arms +0.29 and below.
* **bare-vs-ESE MSE** — the zero-shift member IS the bare UPR forward
  (its mean is ``model(x) + 0``), so the guard can verify the paper's
  core claim (ensembling never hurts) without an extra forward.

``fit_member_offsets`` is the post-hoc repair: a per-member scalar offset
``c_k = mean(logvar_k) - log(mean |err_k|)`` fit on calibration scenes.
Subtracting ``c_k`` re-centers every member's logvar onto the log of its
actual error scale, which removes exactly the per-member (= per-shift)
systematic bias that drives both failure modes, while leaving the
within-member pixel ordering untouched.  Exposed as
``--val_recalibrate`` on the validate CLI and bakeable into serving
artifacts (export ``--calibration``).
"""

from __future__ import annotations

import numpy as np

# Measured populations (docs/STATUS.md): healthy checkpoints score +0.80
# (round-2 parity UPR) and +0.863 (round-5 anchor arm); the broken arms
# score +0.29 (shift-tracking logvar, ESE 80.8) and lower (outright
# collapse, ESE 205).  0.5 splits the populations with ≥ 0.2 margin on
# both sides; update this note whenever a new arm adds a data point.
RANK_CORR_MIN = 0.5
# ESE may not be worse than the bare model beyond float/selection noise
ESE_MSE_TOL = 1.05


def member_rank_corr(logvars: np.ndarray, errs: np.ndarray) -> np.ndarray:
    """Per-pixel Spearman rank correlation along the member axis (axis 0).

    :param logvars: ``(K, H, W)``
    :param errs: ``(K, H, W)``
    :returns: ``(H, W)`` correlation map in [-1, 1]
    """
    def ranks(x):
        order = np.argsort(x, axis=0)
        rk = np.empty(order.shape, np.float32)
        member_idx = np.arange(x.shape[0], dtype=np.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        np.put_along_axis(rk, order, np.broadcast_to(member_idx, x.shape),
                          axis=0)
        return rk
    ra, rb = ranks(logvars), ranks(errs)
    ra -= ra.mean(0)
    rb -= rb.mean(0)
    denom = np.sqrt((ra ** 2).sum(0) * (rb ** 2).sum(0)) + 1e-9
    return (ra * rb).sum(0) / denom


def scene_calibration(shifts: np.ndarray, means: np.ndarray,
                      logvars: np.ndarray, gt: np.ndarray,
                      mask: np.ndarray) -> dict:
    """Per-scene calibration statistics from the member stacks.

    :param shifts: ``(K,)`` member shift grid
    :param means: ``(K, H, W)`` member means (already ``+ shift_k``)
    :param logvars: ``(K, H, W)`` member logvars (as selected on)
    :param gt: ``(H, W)``
    :param mask: ``(H, W)`` bool — pixels the metrics count
    """
    errs = np.abs(means - gt[None])
    corr = float(member_rank_corr(logvars, errs)[mask].mean())

    bare_mse = None
    k0 = int(np.argmin(np.abs(shifts)))
    # "zero" up to the float32 accumulation error of the arange grid: the
    # reference-default grid's member 35 is -3.3e-6, not 0.0, which made
    # the bare-model check silently vanish on every default-grid run
    # (found on the round-5 anchor arms).  1e-3 is far below any step.
    if abs(float(shifts[k0])) < 1e-3:
        bare_mse = float(((means[k0] - gt) ** 2)[mask].mean())
    return {'rank_corr': corr, 'bare_mse': bare_mse}


def calibration_report(per_scene: list[dict], ese_mse: float) -> dict:
    """Aggregate per-scene stats into the guard verdict.

    :returns: dict with ``rank_corr``, ``bare_mse``, ``ese_mse``,
        ``calibrated`` (bool) and ``warnings`` (list of strings, empty
        when healthy).
    """
    corr = float(np.mean([s['rank_corr'] for s in per_scene]))
    bares = [s['bare_mse'] for s in per_scene if s['bare_mse'] is not None]
    bare_mse = float(np.mean(bares)) if bares else None

    warnings = []
    if corr < RANK_CORR_MIN:
        warnings.append(
            f'ESE CALIBRATION WARNING: member logvar/|err| rank '
            f'correlation {corr:+.3f} < {RANK_CORR_MIN:+.2f} — the logvar '
            f'head does not order ensemble members by their error, so '
            f'min-logvar selection is unreliable (healthy checkpoints '
            f'score ~+0.8).  Do not ship this checkpoint\'s ensemble '
            f'without recalibration (--val_recalibrate) or retraining '
            f'(--train_logvar_anchor).')
    if bare_mse is not None and ese_mse > bare_mse * ESE_MSE_TOL:
        warnings.append(
            f'ESE CALIBRATION WARNING: ensemble MSE {ese_mse:.5f} exceeds '
            f'the bare (zero-shift) model\'s {bare_mse:.5f} — member '
            f'selection is actively harmful on this checkpoint.')
    return {'rank_corr': corr, 'bare_mse': bare_mse, 'ese_mse': ese_mse,
            'calibrated': not warnings, 'warnings': warnings}


def fit_member_offsets(scene_stats: list[tuple], eps: float = 1e-6
                       ) -> np.ndarray:
    """Fit per-member logvar offsets on calibration scenes.

    :param scene_stats: list of ``(means, logvars, gt, mask)`` tuples with
        shapes as in :func:`scene_calibration`
    :returns: ``(K,)`` offsets ``c_k``; selection/posteriors should use
        ``logvar_k - c_k``

    ``c_k = mean_px(logvar_k) - log(mean_px |err_k|)`` over all
    calibration pixels: after subtraction each member's mean logvar equals
    the log of its actual mean |error| (the heteroscedastic-L1 optimum,
    ``exp(logvar) = |err|``, in expectation).
    """
    lv_sum = err_sum = None
    n_px = 0
    for means, logvars, gt, mask in scene_stats:
        errs = np.abs(means - gt[None])[:, mask]      # (K, n)
        lvs = logvars[:, mask]
        if lv_sum is None:
            lv_sum = lvs.sum(1)
            err_sum = errs.sum(1)
        else:
            lv_sum += lvs.sum(1)
            err_sum += errs.sum(1)
        n_px += lvs.shape[1]
    lv_mean = lv_sum / max(n_px, 1)
    err_mean = err_sum / max(n_px, 1)
    return (lv_mean - np.log(np.maximum(err_mean, eps))).astype(np.float32)
