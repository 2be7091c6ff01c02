"""Mask builders: margin masks and the texture mask.

Reference semantics: mmlf/data/hci4d.py:15-69 and mmlf/model/loss.py:6-26.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def create_mask_margin(shape, margin: int = 0):
    """Boolean mask with a ``margin``-wide False border on the last two dims."""
    assert margin >= 0
    mask = jnp.ones(shape, dtype=bool)
    if margin > 0:
        h, w = shape[-2], shape[-1]
        row_ok = (jnp.arange(h) >= margin) & (jnp.arange(h) < h - margin)
        col_ok = (jnp.arange(w) >= margin) & (jnp.arange(w) < w - margin)
        mask = mask & row_ok[:, None] & col_ok[None, :]
    return mask


def create_mask_margin_np(shape, margin: int = 0) -> np.ndarray:
    """Numpy variant for host-side dataset code."""
    assert margin >= 0
    mask = np.ones(shape, dtype=bool)
    if margin > 0:
        mask[..., :margin, :] = False
        mask[..., -margin:, :] = False
        mask[..., :margin] = False
        mask[..., -margin:] = False
    return mask


def create_mask_texture(center: np.ndarray, wsize: int = 23,
                        threshold: float = 0.02) -> np.ndarray:
    """Texture mask: False where the local mean-absolute-deviation is low.

    For each pixel, the mean L1 distance between the pixel and every pixel of
    its ``wsize``×``wsize`` zero-padded neighborhood (averaged over window
    positions and the 3 color channels) must be ``>= threshold``; a
    ``wsize // 2`` margin is additionally masked out.  Matches the reference's
    unfold-based computation (mmlf/data/hci4d.py:38-69) but runs as an
    accumulation over window offsets (O(wsize^2) passes, no 23^2-channel
    intermediate).

    :param center: ``(H, W, 3)`` float32 center view (channel-last)
    :returns: ``(H, W)`` int32 mask
    """
    center = np.asarray(center, dtype=np.float32)

    # native multithreaded path (~20× faster at cache time); numpy fallback
    from ..native import texture_mask as native_texture_mask
    out = native_texture_mask(center, wsize, threshold)
    if out is not None:
        return out

    h, w, c = center.shape
    r = wsize // 2

    padded = np.pad(center, ((r, r), (r, r), (0, 0)))
    acc = np.zeros((h, w), dtype=np.float32)
    for dy in range(wsize):
        for dx in range(wsize):
            acc += np.abs(padded[dy:dy + h, dx:dx + w] - center).sum(-1)
    mad = acc / float(wsize * wsize * c)

    mask = (mad >= threshold).astype(np.int32)
    mask *= create_mask_margin_np((h, w), r).astype(np.int32)
    return mask
