"""Pallas TPU kernel: Laplace-mixture posterior readout for the ESE ensemble.

The ensemble's per-pixel posterior is a K-member mixture evaluated on a
K-bin disparity grid (reference mmlf/model/ensamble.py:88-101 — its second
hot loop).  Accumulating it member-by-member in HBM (the scan-carry
formulation) moves the ``(b, H, W, K)`` accumulator through HBM twice per
member: for a 512² scene and 70 members that is ~10 GB of traffic for
~6.4 GFLOP of math — hopelessly bandwidth-bound.

This kernel tiles pixels onto the 128-lane axis, keeps the whole accumulator
tile in VMEM, and loops the K members on-chip: HBM traffic drops to one read
of means/vars and one write of the posterior (~0.25 GB for the same scene),
a ~40× reduction.

Layout: pixels on lanes → operands ``(K, TILE_P)``, output ``(Kb, TILE_P)``;
the caller transposes once at the end.  ``exp(logvar)`` is the Laplace
*scale* (reference quirk, see models/ensemble.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 2048


def _mixture_kernel(bins_ref, means_ref, vars_ref, out_ref):
    n_members = means_ref.shape[0]
    bins = bins_ref[...]                       # (Kb, 1)

    def member(i, acc):
        m = means_ref[pl.ds(i, 1), :]          # (1, TILE_P)
        v = vars_ref[pl.ds(i, 1), :]
        return acc + jnp.exp(-jnp.abs(bins - m) / v) / (2.0 * v)

    acc = jax.lax.fori_loop(
        0, n_members, member,
        jnp.zeros(out_ref.shape, jnp.float32))
    out_ref[...] = acc / float(n_members)


@functools.partial(jax.jit, static_argnames=('interpret',))
def laplace_mixture_posterior(means, variances, bins, interpret=False):
    """Mixture posterior over a bin grid.

    :param means: ``(K, P)`` member locations (pixels flattened)
    :param variances: ``(K, P)`` member Laplace scales
    :param bins: ``(Kb,)`` evaluation grid
    :returns: ``(Kb, P)`` mixture density, mean over members
    """
    k, p = means.shape
    kb = bins.shape[0]

    p_pad = (p + TILE_P - 1) // TILE_P * TILE_P
    if p_pad != p:
        pad = ((0, 0), (0, p_pad - p))
        means = jnp.pad(means, pad)
        variances = jnp.pad(variances, pad, constant_values=1.0)

    out = pl.pallas_call(
        _mixture_kernel,
        grid=(p_pad // TILE_P,),
        in_specs=[
            pl.BlockSpec((kb, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, TILE_P), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kb, p_pad), jnp.float32),
        interpret=interpret,
    )(bins.astype(jnp.float32).reshape(kb, 1),
      means.astype(jnp.float32), variances.astype(jnp.float32))

    return out[:, :p]


def ensemble_posterior(means, logvars, disp_min: float, disp_max: float,
                       interpret: bool = False):
    """ESE posterior from stacked member outputs.

    :param means: ``(K, b, H, W)`` member means (already shift-corrected)
    :param logvars: ``(K, b, H, W)`` member logvars
    :returns: ``(b, H, W, K)`` posterior over ``linspace(min, max, K)`` bins
    """
    k = means.shape[0]
    spatial = means.shape[1:]
    bins = jnp.linspace(disp_min, disp_max, k, dtype=jnp.float32)

    flat_m = means.reshape(k, -1)
    flat_v = jnp.exp(logvars).reshape(k, -1)
    post = laplace_mixture_posterior(flat_m, flat_v, bins,
                                     interpret=interpret)   # (K, P)
    return jnp.moveaxis(post.reshape((k,) + spatial), 0, -1)
