"""Regression <-> classification codecs for the discrete (DPP) head.

Semantics match reference mmlf/utils/dl.py:109-182, with the class axis moved
LAST (``(..., H, W, S)``) to align with channel-last conv outputs on TPU.

Bin grid: ``linspace(start, stop, n_steps)`` with half-open membership
``|bin - x| < step/2`` where ``step = (stop - start) / n_steps`` — note the
reference divides by ``n_steps`` (not ``n_steps - 1``); preserved for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bin_centers(start: float, stop: float, n_steps: int) -> jnp.ndarray:
    return jnp.linspace(start, stop, n_steps, dtype=jnp.float32)


def reg_to_class(arr, start: float, stop: float, n_steps: int):
    """Continuous values -> one-hot over disparity bins.

    :param arr: ``(..., H, W)`` continuous values
    :returns: ``(..., H, W, n_steps)`` float one-hot (all-zero if out of range)
    """
    step = (stop - start) / n_steps
    bins = bin_centers(start, stop, n_steps)
    return (jnp.abs(bins - arr[..., None]) < step / 2.0).astype(jnp.float32)


def class_to_reg(arr, start: float, stop: float, n_steps: int):
    """One-hot (or multi-hot) -> continuous value as sum of bin centers.

    :param arr: ``(..., H, W, n_steps)``
    :returns: ``(..., H, W)``
    """
    bins = bin_centers(start, stop, n_steps)
    return jnp.sum(bins * arr, axis=-1)


def mpi_to_weights(mpi, start: float, stop: float, n_steps: int):
    """MPI planes -> alpha-weighted multi-hot over disparity bins.

    :param mpi: ``(..., K, H, W, 5)`` — alpha at channel 3, disparity at 4
    :returns: ``(..., H, W, n_steps)``

    Accumulates over the K plane axis with a scan to avoid materializing the
    ``(..., K, H, W, S)`` intermediate (reference mmlf/utils/dl.py:134-157
    materializes it; at bs=512 that would be tens of GB).
    """
    step = (stop - start) / n_steps
    bins = bin_centers(start, stop, n_steps)
    k_axis = mpi.ndim - 4

    def one_plane(carry, plane):
        alpha = plane[..., 3]
        disp = plane[..., 4]
        hot = (jnp.abs(bins - disp[..., None]) < step / 2.0)
        return carry + hot.astype(jnp.float32) * alpha[..., None], None

    planes = jnp.moveaxis(mpi, k_axis, 0)
    init = jnp.zeros(planes.shape[1:-1] + (n_steps,), dtype=jnp.float32)
    out, _ = jax.lax.scan(one_plane, init, planes)
    return out
