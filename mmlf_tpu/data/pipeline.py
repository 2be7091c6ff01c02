"""TPU training input pipeline: host window extraction + on-device augment.

The reference's augmentation chain runs per-sample in DataLoader worker
processes (deepcopy of the full scene + full-image shift/crop/color,
reference mmlf/train/cli.py:72-92, hci4d.py:289-291) — at bs=512 this
starves any accelerator.  Here the work is split TPU-first:

HOST (numpy, cheap): per sample choose the downsample factor ``f`` and the
random-crop position, then copy only a small ``(ps+24)``-pixel window from
the cached (static-shifted) scene at stride ``f``.  All random augmentation
*parameters* (sub-pixel shift, rotation k, color matrix, brightness/contrast
alphas, crop offsets) are sampled here and shipped as small arrays.

DEVICE (inside the jitted train step, vmapped over the batch): sub-pixel
EPI-Shift, crop to ``ps``, rot90 with stack swaps, color redistribution,
brightness, contrast.  The augmentations fuse with the model forward into a
single XLA program.

Equivalence to the reference chain
  ``Shift(train_shift) → RandomDownSampling → RandomShift(1) →
  RandomCrop(ps+16) → CenterCrop(ps) → RandomRotate → RedistColor →
  Brightness → Contrast``
is exact except for one documented deviation: the random sub-pixel shift
wraps circularly *within the extracted window* instead of within the full
(downsampled) image.  Both variants' wrap artifacts land in the guard band
that CenterCrop discards (the reference's band is why it crops ps+16 → ps);
the visible ps×ps patch distribution is identical away from the image
border, and differs only in which wrapped pixels a border-touching crop
would have seen.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..config import Config
from ..ops.shift import shift_lf
from . import transforms as T
from .hci4d import HCI4D

GUARD = 4          # wrap guard for the ±1 px random shift at the outer views
EXTRA = 16         # RandomCrop(ps+16) → CenterCrop(ps) band
MAX_PLANES = 12


class AugParams(NamedTuple):
    """Per-sample augmentation parameters (host-sampled, device-applied)."""
    shift: jnp.ndarray       # (b,) random sub-pixel shift disparity
    y_off: jnp.ndarray       # (b,) crop offset within the window, [0, 8]
    x_off: jnp.ndarray       # (b,)
    rot_k: jnp.ndarray       # (b,) number of 90° rotations, [0, 3]
    color: jnp.ndarray       # (b, 3, 3) color redistribution matrix
    brightness: jnp.ndarray  # (b,)
    contrast: jnp.ndarray    # (b,)


class Batch(NamedTuple):
    h: jnp.ndarray           # (b, n, W, W, 3) window stacks, W = ps + 24
    v: jnp.ndarray
    i: jnp.ndarray
    d: jnp.ndarray
    gt: jnp.ndarray          # (b, W, W)
    mpi: jnp.ndarray         # (b, K, W, W, 5)
    mask: jnp.ndarray        # (b, W, W) int32
    aug: AugParams


def window_size(ps: int) -> int:
    return ps + EXTRA + 2 * GUARD


def pad_mpi(mpi: np.ndarray, k: int = MAX_PLANES) -> np.ndarray:
    """Zero-alpha-pad the plane axis to a fixed K for static batch shapes."""
    if mpi.shape[0] >= k:
        return mpi[:k]
    pad = np.zeros((k - mpi.shape[0],) + mpi.shape[1:], mpi.dtype)
    return np.concatenate([mpi, pad], 0)


class TrainPipeline:
    """Caches (static-shifted) scenes and emits window batches."""

    def __init__(self, dataset: HCI4D, cfg: Config, seed: int = 0):
        self.cfg = cfg
        self.ps = cfg.train_ps
        self.win = window_size(self.ps)
        self.augment = not cfg.train_no_data_augment
        self.max_f = cfg.train_max_downscale if self.augment else 1
        self.rng = np.random.default_rng(seed)

        if not dataset.cache:
            dataset.cache_scenes()

        self.scenes = []
        for data in (dataset.data if dataset.cache else
                     [dataset[i] for i in range(len(dataset.scenes))]):
            h, v, i, d, center, gt, mpi, mask, _ = data
            if cfg.train_shift != 0.0:
                # the static Shift is deterministic and first in the chain —
                # apply once at cache time (reference re-shifts per sample)
                h, v, i, d = T.np_shift_lf(h, v, i, d, cfg.train_shift)
                gt = gt - np.float32(cfg.train_shift)
                mpi = mpi.copy()
                mpi[..., 4] -= np.float32(cfg.train_shift)
            self.scenes.append(dict(
                h=h, v=v, i=i, d=d, gt=gt.astype(np.float32),
                mpi=pad_mpi(mpi.astype(np.float32)),
                mask=mask.astype(np.int32)))

        self.length = len(dataset) if len(dataset) else len(self.scenes)

    def _positions(self, shape, f: int):
        """Sample window/crop positions in the stride-f grid.

        Returns (ws_y, ws_x, y_off, x_off): window start (downsampled
        coords) and the 112-region offset within the window.
        """
        win = self.win
        hf = (shape[0] + f - 1) // f
        wf = (shape[1] + f - 1) // f
        assert hf >= win and wf >= win, \
            (f'scene too small ({hf}x{wf}) for ps={self.ps} window {win} '
             f'at downscale {f}; lower train_ps or train_max_downscale')

        # exact RandomCrop(ps+16) position in the downsampled grid
        # (inclusive upper bound, like the reference's random.randint)
        y112 = self.rng.integers(0, hf - (self.ps + EXTRA) + 1)
        x112 = self.rng.integers(0, wf - (self.ps + EXTRA) + 1)
        ws_y = int(np.clip(y112 - GUARD, 0, max(hf - win, 0)))
        ws_x = int(np.clip(x112 - GUARD, 0, max(wf - win, 0)))
        return ws_y, ws_x, int(y112 - ws_y), int(x112 - ws_x)

    def _window(self, scene: dict, f: int):
        """Extract one stride-f window; returns field dict + crop offsets."""
        win = self.win
        ws_y, ws_x, y_off, x_off = self._positions(scene['gt'].shape, f)
        gt = scene['gt'][::f, ::f]

        def cut(arr, spatial_from):
            if spatial_from == 1 and arr.dtype == np.float32 and \
                    arr.flags.c_contiguous:
                from ..native import strided_window
                out = strided_window(arr, ws_y, ws_x, f, win)
                if out is not None:
                    return out
            sl = (slice(None),) * spatial_from + (
                slice(None, None, f),) * 2
            a = arr[sl]
            sl2 = (slice(None),) * spatial_from + (
                slice(ws_y, ws_y + win), slice(ws_x, ws_x + win))
            return np.ascontiguousarray(a[sl2])

        out = {
            'h': cut(scene['h'], 1), 'v': cut(scene['v'], 1),
            'i': cut(scene['i'], 1), 'd': cut(scene['d'], 1),
            'gt': np.ascontiguousarray(
                gt[ws_y:ws_y + win, ws_x:ws_x + win]) / np.float32(f),
            'mask': cut(scene['mask'], 0),
        }
        mpi = cut(scene['mpi'], 1)
        mpi = mpi.copy()
        mpi[..., 4] /= np.float32(f)
        out['mpi'] = mpi
        return out, y_off, x_off

    def sample_batch(self, batch_size: int) -> Batch:
        fields = {k: [] for k in ('h', 'v', 'i', 'd', 'gt', 'mpi', 'mask')}
        y_offs, x_offs = [], []
        for _ in range(batch_size):
            idx = int(self.rng.integers(0, len(self.scenes)))
            f = int(self.rng.integers(1, self.max_f + 1))
            w, y_off, x_off = self._window(self.scenes[idx], f)
            for k, arr in w.items():
                fields[k].append(arr)
            y_offs.append(y_off)
            x_offs.append(x_off)

        b = batch_size
        if self.augment:
            aug = AugParams(
                shift=self.rng.uniform(-1.0, 1.0, b).astype(np.float32),
                y_off=np.asarray(y_offs, np.int32),
                x_off=np.asarray(x_offs, np.int32),
                rot_k=self.rng.integers(0, 4, b).astype(np.int32),
                color=np.stack([T.random_color_matrix() for _ in range(b)]),
                brightness=(self.rng.uniform(-0.9, 0.9, b) + 1.0
                            ).astype(np.float32),
                contrast=(self.rng.uniform(-0.9, 0.9, b) + 1.0
                          ).astype(np.float32),
            )
        else:
            aug = AugParams(
                shift=np.zeros(b, np.float32),
                y_off=np.asarray(y_offs, np.int32),
                x_off=np.asarray(x_offs, np.int32),
                rot_k=np.zeros(b, np.int32),
                color=np.broadcast_to(np.eye(3, dtype=np.float32),
                                      (b, 3, 3)).copy(),
                brightness=np.ones(b, np.float32),
                contrast=np.ones(b, np.float32),
            )
        return Batch(
            h=np.stack(fields['h']), v=np.stack(fields['v']),
            i=np.stack(fields['i']), d=np.stack(fields['d']),
            gt=np.stack(fields['gt']), mpi=np.stack(fields['mpi']),
            mask=np.stack(fields['mask']), aug=aug)


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

def _rot90_sample(h, v, i, d, gt, mpi):
    """One 90° rotation of a single sample (stacks (n,P,P,3), gt (P,P),
    mpi (K,P,P,5)); the mask is deliberately NOT rotated (reference quirk,
    see data/transforms.py Rotate90)."""
    rot_s = lambda a: jnp.flip(jnp.swapaxes(a, -3, -2), -3)   # stacks / mpi
    rot_g = lambda a: jnp.flip(jnp.swapaxes(a, -2, -1), -2)   # gt
    h, v, i, d = rot_s(h), rot_s(v), rot_s(i), rot_s(d)
    h, v = v, jnp.flip(h, -4)
    i, d = d, jnp.flip(i, -4)
    return h, v, i, d, rot_g(gt), rot_s(mpi)


def augment_sample(h, v, i, d, gt, mpi, mask, aug: AugParams, ps: int):
    """Apply the random augmentations to one window sample (device)."""
    n = h.shape[0]

    # sub-pixel EPI-Shift within the window
    h, v, i, d = shift_lf(h, v, i, d, aug.shift)
    gt = gt - aug.shift
    mpi = mpi.at[..., 4].add(-aug.shift)

    # RandomCrop completion + CenterCrop: the ps patch starts at
    # (y_off + EXTRA/2) within the window (see TrainPipeline._window)
    y0 = aug.y_off + EXTRA // 2
    x0 = aug.x_off + EXTRA // 2
    crop_s = lambda a: jax.lax.dynamic_slice(
        a, (0, y0, x0, 0), (a.shape[0], ps, ps, a.shape[3]))
    h, v, i, d, mpi = crop_s(h), crop_s(v), crop_s(i), crop_s(d), crop_s(mpi)
    gt = jax.lax.dynamic_slice(gt, (y0, x0), (ps, ps))
    mask = jax.lax.dynamic_slice(mask, (y0, x0), (ps, ps))

    # RandomRotate: k ∈ {0..3} applications of rot90
    def rot_times(k):
        def branch(_):
            a = (h, v, i, d, gt, mpi)
            for _ in range(k):
                a = _rot90_sample(*a)
            return a
        return branch
    h, v, i, d, gt, mpi = jax.lax.switch(
        aug.rot_k, [rot_times(k) for k in range(4)], None)

    # RedistColor on the four stacks (channel-last einsum)
    mix = lambda a: jnp.einsum('...c,dc->...d', a, aug.color)
    h, v, i, d = mix(h), mix(v), mix(i), mix(d)

    # Brightness then Contrast (contrast pivots on the h-stack mean)
    h, v, i, d = (a * aug.brightness for a in (h, v, i, d))
    pivot = jnp.mean(h) * (1.0 - aug.contrast)
    h, v, i, d = (a * aug.contrast + pivot for a in (h, v, i, d))

    return h, v, i, d, gt, mpi, mask


def augment_batch(batch: Batch, ps: int):
    """vmap of augment_sample over the batch (used inside the train step)."""
    def one(h, v, i, d, gt, mpi, mask, *aug_fields):
        return augment_sample(h, v, i, d, gt, mpi, mask,
                              AugParams(*aug_fields), ps)
    return jax.vmap(one)(batch.h, batch.v, batch.i, batch.d, batch.gt,
                         batch.mpi, batch.mask, *batch.aug)


# ---------------------------------------------------------------------------
# device-resident pipeline: scenes live in HBM, the host ships only indices
# ---------------------------------------------------------------------------

class DeviceSceneCache(struct.PyTreeNode):
    """All (static-shifted) scenes stacked in device memory.

    The full HCI training set (16 scenes × 4 stacks × 9×512×512×3 + MPI)
    is ~3 GB — it fits TPU HBM comfortably, which turns the per-step input
    problem from "copy 0.5 GB of windows through the host" into "ship a few
    hundred bytes of indices"; window extraction becomes a gather inside the
    jitted train step.

    Layout notes (both matter for speed):
      * pixel-major ``(·, W, n, 3)`` (MPI ``(·, W, K, 5)``) so a window
        gather reads contiguous (view, channel) lanes per pixel;
      * the scene and row axes are PRE-FLATTENED to ``(S·H, W, ...)`` on the
        host — the cache travels through jit as an *argument* (a closure
        would embed it as HLO constants and blow up remote compilation),
        and an in-jit reshape of an argument re-tiles gigabytes per step.
    ``height`` rides along as static metadata for row-index arithmetic.
    """
    h: Any                   # (S*H, W, n, 3)
    v: Any
    i: Any
    d: Any
    gt: Any                  # (S*H, W)
    mpi: Any                 # (S*H, W, K, 5)
    mask: Any                # (S*H, W) int32
    height: int = struct.field(pytree_node=False, default=0)


class DeviceBatch(NamedTuple):
    """Per-sample window coordinates + augmentation parameters (host RNG)."""
    scene: jnp.ndarray       # (b,) int32 scene index
    factor: jnp.ndarray      # (b,) int32 downsample factor
    ws_y: jnp.ndarray        # (b,) int32 window start (downsampled coords)
    ws_x: jnp.ndarray
    aug: AugParams


def build_device_cache(scenes, sharding=None) -> DeviceSceneCache:
    """Stack TrainPipeline scene dicts and put them on device (replicated
    across the mesh when a sharding is given)."""
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put
    height = scenes[0]['gt'].shape[0]

    def stack(key):
        arr = np.stack([s[key] for s in scenes])
        if key in ('h', 'v', 'i', 'd', 'mpi'):
            # (S, n|K, H, W, C) → pixel-major (S, H, W, n|K, C)
            arr = np.ascontiguousarray(np.moveaxis(arr, 1, 3))
        # fold (S, H) on the host — see the class docstring
        return put(arr.reshape((-1,) + arr.shape[2:]))

    return DeviceSceneCache(h=stack('h'), v=stack('v'), i=stack('i'),
                            d=stack('d'), gt=stack('gt'), mpi=stack('mpi'),
                            mask=stack('mask'), height=height)


def gather_windows(cache: DeviceSceneCache, batch: DeviceBatch,
                   win: int) -> Batch:
    """Gather stride-f windows from the device cache (inside jit).

    Row/col index vectors ``f * (ws + arange(win))`` make the downsample a
    part of the gather, so the traced per-sample factor costs nothing extra.
    GT and MPI disparities are rescaled by ``1/f`` (DownSampling semantics).
    """
    h_axis = cache.height

    def one(scene, f, ws_y, ws_x):
        rows = scene * h_axis + (ws_y + jnp.arange(win, dtype=jnp.int32)) * f
        cols = (ws_x + jnp.arange(win, dtype=jnp.int32)) * f
        f_inv = 1.0 / f.astype(jnp.float32)

        def pick(a, move):
            # scene selection + row gather is ONE take of large contiguous
            # (W, n, C) slices on the pre-flattened (S·H, ...) cache, then a
            # column take — far cheaper on TPU than a 2-D per-pixel gather
            w = jnp.take(jnp.take(a, rows, axis=0), cols, axis=1)
            return jnp.moveaxis(w, 2, 0) if move else w

        h = pick(cache.h, True)
        v = pick(cache.v, True)
        i = pick(cache.i, True)
        d = pick(cache.d, True)
        gt = pick(cache.gt, False) * f_inv
        mpi = pick(cache.mpi, True)
        mpi = mpi.at[..., 4].multiply(f_inv)
        mask = pick(cache.mask, False)
        return h, v, i, d, gt, mpi, mask

    h, v, i, d, gt, mpi, mask = jax.vmap(one)(
        batch.scene, batch.factor, batch.ws_y, batch.ws_x)
    return Batch(h=h, v=v, i=i, d=d, gt=gt, mpi=mpi, mask=mask,
                 aug=batch.aug)


class DevicePipeline(TrainPipeline):
    """TrainPipeline variant emitting index-only batches for a device cache.

    Shares the position/augmentation RNG logic with the host pipeline, so
    both produce identically-distributed samples.
    """

    def __init__(self, dataset: HCI4D, cfg: Config, seed: int = 0,
                 sharding=None):
        super().__init__(dataset, cfg, seed)
        shapes = {s['gt'].shape for s in self.scenes}
        assert len(shapes) == 1, \
            f'device cache needs uniform scene shapes, got {shapes}'
        self.scene_shape = shapes.pop()
        self.cache = build_device_cache(self.scenes, sharding)

    def sample_batch(self, batch_size: int) -> DeviceBatch:
        scene_idx = self.rng.integers(0, len(self.scenes), batch_size)
        factors = self.rng.integers(1, self.max_f + 1, batch_size)
        ws_y = np.zeros(batch_size, np.int32)
        ws_x = np.zeros(batch_size, np.int32)
        y_offs = np.zeros(batch_size, np.int32)
        x_offs = np.zeros(batch_size, np.int32)
        for b in range(batch_size):
            ws_y[b], ws_x[b], y_offs[b], x_offs[b] = self._positions(
                self.scene_shape, int(factors[b]))

        if self.augment:
            aug = AugParams(
                shift=self.rng.uniform(-1.0, 1.0,
                                       batch_size).astype(np.float32),
                y_off=y_offs, x_off=x_offs,
                rot_k=self.rng.integers(0, 4, batch_size).astype(np.int32),
                color=np.stack([T.random_color_matrix()
                                for _ in range(batch_size)]),
                brightness=(self.rng.uniform(-0.9, 0.9, batch_size)
                            + 1.0).astype(np.float32),
                contrast=(self.rng.uniform(-0.9, 0.9, batch_size)
                          + 1.0).astype(np.float32),
            )
        else:
            b = batch_size
            aug = AugParams(
                shift=np.zeros(b, np.float32), y_off=y_offs, x_off=x_offs,
                rot_k=np.zeros(b, np.int32),
                color=np.broadcast_to(np.eye(3, dtype=np.float32),
                                      (b, 3, 3)).copy(),
                brightness=np.ones(b, np.float32),
                contrast=np.ones(b, np.float32),
            )
        return DeviceBatch(scene=scene_idx.astype(np.int32),
                           factor=factors.astype(np.int32),
                           ws_y=ws_y, ws_x=ws_x, aug=aug)
