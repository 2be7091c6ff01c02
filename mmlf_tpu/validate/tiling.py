"""Overlapping-patch tiled inference for full scenes.

The fully-convolutional net runs whole 512² scenes in one program on a
single chip (the default), but arbitrarily large scenes are bounded by HBM.
This utility tiles the scene with a halo of at least the network's receptive
field: interior tile outputs are then *identical* to the full-image forward
(zero-padding only ever coincides with the true image border), so tiling is
exact, not an approximation.  This is the spatial analogue of sequence
parallelism for this workload (SURVEY.md §5) and compiles ONE program for
the fixed tile shape regardless of scene size.
"""

from __future__ import annotations

import numpy as np
import jax


def receptive_radius(ksize: int, in_blocks: int, out_blocks: int) -> int:
    """Upper bound on the one-sided receptive field of the conv trunk.

    Every conv extends the reach by (ksize - 1); each block has two convs.
    """
    return 2 * (in_blocks + out_blocks) * (ksize - 1)


def tiled_forward(apply_fn, variables, stacks, tile: int, halo: int):
    """Run ``apply_fn`` over overlapping tiles and stitch the results.

    :param apply_fn: ``fn(variables, h, v, i, d) -> output dict`` whose
        array outputs are laid out ``(b, H, W)`` or ``(b, H, W, C)``
    :param stacks: four ``(b, n, H, W, 3)`` view stacks
    :param tile: interior tile size (output pixels per tile per axis)
    :param halo: overlap on each side; must be >= the receptive radius
    :returns: output dict stitched to full scene size
    """
    b, n, h, w, c = stacks[0].shape
    ny = -(-h // tile)
    nx = -(-w // tile)

    outputs = None
    for ty in range(ny):
        for tx in range(nx):
            y0 = ty * tile
            x0 = tx * tile
            # clamp the padded window inside the image; remember the offset
            # of the interior region within the window
            wy0 = max(0, min(y0 - halo, h - tile - 2 * halo))
            wx0 = max(0, min(x0 - halo, w - tile - 2 * halo))
            iy = y0 - wy0
            ix = x0 - wx0

            win = [s[:, :, wy0:wy0 + tile + 2 * halo,
                     wx0:wx0 + tile + 2 * halo] for s in stacks]
            out = apply_fn(variables, *win)

            y1 = min(y0 + tile, h)
            x1 = min(x0 + tile, w)
            if outputs is None:
                outputs = {}
                for k, v in out.items():
                    if v is None:
                        outputs[k] = None
                    else:
                        shape = (v.shape[0], h, w) + v.shape[3:]
                        outputs[k] = np.zeros(shape, np.float32)
            for k, v in out.items():
                if v is None:
                    continue
                patch = np.asarray(
                    v[:, iy:iy + (y1 - y0), ix:ix + (x1 - x0)])
                outputs[k][:, y0:y1, x0:x1] = patch
    return outputs


def make_tiled_forward(model, tile: int = 256, halo: int = None):
    """Convenience wrapper: jitted per-tile apply + stitching.

    The per-tile apply compiles once; every tile of every scene reuses it.
    """
    if halo is None:
        halo = receptive_radius(model.ksize, model.in_blocks,
                                model.out_blocks)
    tile_fn = jax.jit(lambda v, *s: model.apply(v, *s))

    def fwd(variables, h, v, i, d):
        return tiled_forward(tile_fn, variables, (h, v, i, d), tile, halo)

    return fwd
