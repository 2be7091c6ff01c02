"""GMM mode counting + "second chance" analysis of saved per-pixel mixtures.

``python -m mmlf_tpu.utils.gmm_cnt INPUT OUTPUT [--start --stop --step]``
(reference: mmlf/utils/gmm_cnt.py): evaluate each pixel's Gaussian mixture
(``gmm.npy``: ``(2, K, H, W)`` means/vars) on a disparity grid, count local
maxima, and try replacing the point estimate with the nearest extreme mode
where that improves the error ("second chance"); writes ``cnts.png``,
``dist.png``, ``result_min/max/best.png`` and ``second_chance.txt``.

The mixture evaluation runs as a chunked jitted JAX program (the reference
evaluates ~1400 grid points × K members per pixel in a Python loop).
"""

from __future__ import annotations

import os
import sys

import click
import numpy as np
import jax
import jax.numpy as jnp

from . import pfm
from .imgio import save_img
from ..ops.masks import create_mask_margin_np


def gaussian(x, mean, var):
    return 1.0 / np.sqrt(2.0 * np.pi * var) * \
        np.exp(-(x - mean) ** 2.0 / (2.0 * var))


@jax.jit
def _mixture_on_grid(means, variances, grid):
    """(K, P) mixture params + (G,) grid -> (G, P) density Σ N(x;μ,σ²)/σ²."""
    def body(acc, mv):
        m, v = mv
        g = 1.0 / jnp.sqrt(2.0 * jnp.pi * v) * \
            jnp.exp(-(grid[:, None] - m[None]) ** 2.0 / (2.0 * v)) / v
        return acc + g, None
    init = jnp.zeros((grid.shape[0], means.shape[1]), jnp.float32)
    out, _ = jax.lax.scan(body, init, (means, variances))
    return out


def count_modes(gmm: np.ndarray, start: float, stop: float, step: float,
                chunk: int = 8192):
    """Returns (counts, mode_min, mode_max) maps for a (2, K, H, W) GMM."""
    _, k, h, w = gmm.shape
    means = gmm[0].reshape(k, -1).astype(np.float32)
    variances = gmm[1].reshape(k, -1).astype(np.float32)
    grid = np.arange(start, stop, step, dtype=np.float32)
    g = len(grid)

    counts = np.zeros(h * w, np.int32)
    mode_min = np.zeros(h * w, np.float32)
    mode_max = np.zeros(h * w, np.float32)

    for lo in range(0, h * w, chunk):
        hi = min(lo + chunk, h * w)
        dens = np.asarray(_mixture_on_grid(
            jnp.asarray(means[:, lo:hi]), jnp.asarray(variances[:, lo:hi]),
            jnp.asarray(grid)))                     # (G, p)
        is_max = np.zeros_like(dens, bool)
        is_max[1:-1] = (dens[1:-1] > dens[:-2]) & (dens[1:-1] > dens[2:])
        counts[lo:hi] = is_max.sum(0)
        idx = np.arange(g)[:, None]
        first = np.where(is_max, idx, g).min(0)
        last = np.where(is_max, idx, -1).max(0)
        has = counts[lo:hi] > 0
        mode_min[lo:hi][has] = first[has] * step + start
        mode_max[lo:hi][has] = last[has] * step + start

    return (counts.reshape(h, w), mode_min.reshape(h, w),
            mode_max.reshape(h, w))


def second_chance(result, gt, mode_min, mode_max):
    """Replace the prediction with the closer extreme mode where better."""
    res_diff = np.abs(gt - result)
    min_diff = np.abs(gt - mode_min)
    max_diff = np.abs(gt - mode_max)
    better = (res_diff > min_diff) | (res_diff > max_diff)
    take_min = min_diff < max_diff
    out = result.copy()
    out[better & take_min] = mode_min[better & take_min]
    out[better & ~take_min] = mode_max[better & ~take_min]
    return out


@click.command()
@click.argument('input', type=click.Path(exists=True))
@click.argument('output', type=click.Path())
@click.option('--start', default=-3.5, help='lower limit')
@click.option('--stop', default=3.5, help='upper limit')
@click.option('--step', default=0.005, help='step width')
def main(input, output, start, stop, step):
    gmm = np.load(os.path.join(input, 'gmm.npy'))
    gt = np.flip(pfm.load(os.path.join(input, 'gt.pfm')), 0)
    result = np.flip(pfm.load(os.path.join(input, 'result.pfm')), 0)

    cnts, mode_min, mode_max = count_modes(gmm, start, stop, step)
    best = second_chance(result, gt, mode_min, mode_max)

    save_img(os.path.join(input, 'cnts.png'),
             cnts / max(cnts.max(), 1))

    dist_out = np.zeros(cnts.shape + (4,), np.float32)
    dist_out[..., 0] = 1.0
    dists = np.abs(mode_min - mode_max)
    dist_out[..., 3] = dists / max(dists.max(), 1e-9)
    save_img(os.path.join(input, 'dist.png'), dist_out)

    lo = min(mode_min.min(), mode_max.min())
    hi = max(mode_min.max(), mode_max.max())
    rng = max(hi - lo, 1e-9)
    save_img(os.path.join(input, 'result_min.png'), (mode_min - lo) / rng)
    save_img(os.path.join(input, 'result_max.png'), (mode_max - lo) / rng)
    save_img(os.path.join(input, 'result_best.png'), best)

    mask = create_mask_margin_np(best.shape, 15)
    mse = float(np.sum((best - gt) ** 2 * mask) / mask.sum())
    badpix = float(np.sum((np.abs(best - gt) > 0.07) * mask) / mask.sum())
    with open(os.path.join(input, 'second_chance.txt'), 'w') as f:
        print('MSE:', mse, file=f)
        print('BadPix:', badpix, file=f)
    print('MSE:', mse, 'BadPix:', badpix)


if __name__ == '__main__':
    sys.exit(main())
