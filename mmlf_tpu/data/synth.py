"""Synthetic light-field scene generator.

Renders HCI4D-layout scene directories (81 ``input_Cam*.png`` views,
``gt_disp_lowres.pfm``, ``gt_mpi_lowres.npz``, optional ``mask.png``) from a
two-layer scene: a textured background plane at one disparity and a textured
foreground patch at another.  Views are rendered with the same sub-pixel
circular-shift model the EPI-Shift op inverts, so a perfect depth estimator
can recover the ground truth exactly and the MPI carries genuinely
multimodal pixels at the occlusion boundary.

There is no real HCI dataset in this environment; this generator backs the
integration tests, the train/validate CLIs, and the benchmark.

Usage: ``python -m mmlf_tpu.data.synth OUT --scenes 4 --size 128``
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import pfm
from ..utils.imgio import save_img
from .transforms import np_roll_lerp_views


def _texture(rng: np.random.Generator, size: int, blur: int = 9):
    """Smooth random RGB texture in [0.1, 0.9] so gradients carry signal."""
    img = rng.random((size, size, 3), dtype=np.float32)
    # cheap separable box blur via cumsum
    for axis in (0, 1):
        k = blur
        pad = np.concatenate([img.take(range(size - k, size), axis),
                              img, img.take(range(k), axis)], axis)
        cs = np.cumsum(pad, axis=axis, dtype=np.float32)
        img = (np.take(cs, range(2 * k, 2 * k + size), axis)
               - np.take(cs, range(size), axis)) / (2 * k)
    lo, hi = img.min(), img.max()
    return 0.1 + 0.8 * (img - lo) / max(hi - lo, 1e-6)


def _shift_img(img: np.ndarray, dy: float, dx: float) -> np.ndarray:
    """Sub-pixel circular shift of (H, W, C) content by (-dy, -dx)."""
    out = np_roll_lerp_views(img[None], np.float32([dy]), axis=-3)[0]
    out = np_roll_lerp_views(out[None], np.float32([dx]), axis=-2)[0]
    return out


def make_scene(rng: np.random.Generator, size: int = 128,
               disp_bg: float = -1.0, disp_fg: float = 1.0,
               nviews=(9, 9)):
    """Render one scene; returns (views[r][c], gt, mpi, fg_alpha)."""
    w, h = nviews
    bg = _texture(rng, size)
    fg = _texture(rng, size)

    # foreground: axis-aligned box covering ~1/4 of the image
    y0, x0 = rng.integers(size // 8, size // 2, 2)
    bh, bw = rng.integers(size // 4, size // 2, 2)
    alpha = np.zeros((size, size), dtype=np.float32)
    alpha[y0:y0 + bh, x0:x0 + bw] = 1.0

    gt = np.where(alpha > 0, np.float32(disp_fg), np.float32(disp_bg))

    # 2-plane MPI (background plane first, matching farthest-first stacking)
    mpi = np.zeros((2, size, size, 5), dtype=np.float32)
    mpi[0, ..., :3] = bg
    mpi[0, ..., 3] = 1.0
    mpi[0, ..., 4] = disp_bg
    mpi[1, ..., :3] = fg
    mpi[1, ..., 3] = alpha
    mpi[1, ..., 4] = disp_fg

    views = {}
    cy, cx = h // 2, w // 2
    for r in range(h):
        for c in range(w):
            # view at grid offset (dr, dc) sees content shifted so that an
            # EPI-Shift by `disp` re-centres disparity `disp` to zero
            dr, dc = r - cy, c - cx
            bg_v = _shift_img(bg, -disp_bg * dr, -disp_bg * dc)
            fg_v = _shift_img(fg, -disp_fg * dr, -disp_fg * dc)
            al_v = _shift_img(alpha[..., None], -disp_fg * dr,
                              -disp_fg * dc)[..., 0]
            views[(r, c)] = (al_v[..., None] * fg_v
                             + (1.0 - al_v[..., None]) * bg_v)
    return views, gt, mpi, alpha


def write_scene(scene_dir: str, views, gt, mpi, nviews=(9, 9)):
    """Write a scene in the on-disk format the HCI4D loader expects."""
    os.makedirs(scene_dir, exist_ok=True)
    w, h = nviews
    for r in range(h):
        for c in range(w):
            idx = r * w + c
            save_img(os.path.join(scene_dir, f'input_Cam{idx:03d}.png'),
                     np.clip(views[(r, c)], 0.0, 1.0))
    # PFM is stored bottom-up; loaders flip on read
    pfm.save(os.path.join(scene_dir, 'gt_disp_lowres.pfm'),
             np.flip(gt.astype(np.float32), 0).copy())
    # npz layout: (H, W, K, 5) bottom-up (see data/hci4d.py load path)
    mpi_file = np.flip(np.transpose(mpi, (1, 2, 0, 3)), 0)
    np.savez_compressed(os.path.join(scene_dir, 'gt_mpi_lowres.npz'),
                        mpi=mpi_file.astype(np.float32))


def generate_dataset(root: str, scenes: int = 4, size: int = 128,
                     seed: int = 0, disp_range: float = 1.8):
    """Generate ``scenes`` scene directories under ``root``."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for s in range(scenes):
        disp_bg = float(rng.uniform(-disp_range, 0.0))
        disp_fg = float(rng.uniform(0.0, disp_range))
        views, gt, mpi, _ = make_scene(rng, size, disp_bg, disp_fg)
        write_scene(os.path.join(root, f'scene_{s:02d}'), views, gt, mpi)
    return root


def main():
    import click

    @click.command()
    @click.argument('output_dir', type=click.Path())
    @click.option('--scenes', default=4, help='Number of scenes')
    @click.option('--size', default=128, help='Scene edge length in pixels')
    @click.option('--seed', default=0, help='RNG seed')
    @click.option('--disp_range', default=1.8,
                  help='Max |disparity| of the two planes')
    def cli(output_dir, scenes, size, seed, disp_range):
        generate_dataset(output_dir, scenes, size, seed, disp_range)
        print(f'Wrote {scenes} synthetic scenes to {output_dir}')

    cli()


if __name__ == '__main__':
    main()
