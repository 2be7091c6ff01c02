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

GUARD = 8          # wrap guard for the ±1 px random shift at the outer views
EXTRA = 16         # RandomCrop(ps+16) → CenterCrop(ps) band
MAX_PLANES = 12
SNAP_PAD = 4       # window starts this far before the RandomCrop position…
MIN_WRAP_GUARD = 5  # …and the crop keeps ≥ this many guard pixels each side


class AugParams(NamedTuple):
    """Per-sample augmentation parameters (host-sampled, device-applied)."""
    shift: jnp.ndarray       # (b,) random sub-pixel shift disparity
    y_off: jnp.ndarray       # (b,) crop offset within the window,
    x_off: jnp.ndarray       # (b,) [0, win - ps - EXTRA//2 - MIN_WRAP_GUARD]
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
    """Window side = patch + crop band + wrap guards, rounded up to the TPU
    sublane tile (16) so windows are DMA-able slices of the packed cache."""
    return (ps + EXTRA + 2 * GUARD + 15) // 16 * 16


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
        self._pool = None            # lazy window-cutter thread pool

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

        # clamp the downsample range to factors whose level still fits one
        # window (the reference would crash cropping a too-small image;
        # degrading gracefully is strictly more robust)
        min_dim = min(min(s['gt'].shape) for s in self.scenes)
        fit = self.max_f
        while fit > 1 and (min_dim + fit - 1) // fit < self.win:
            fit -= 1
        if fit < self.max_f:
            print(f'train_max_downscale clamped {self.max_f} -> {fit}: '
                  f'window {self.win} does not fit a {min_dim}px scene '
                  f'at coarser levels')
            self.max_f = fit

    def _positions(self, shape, f: int):
        """Sample window/crop positions in the stride-f grid.

        Returns (ws_y, ws_x, y_off, x_off): window start (downsampled
        coords) and the 112-region offset within the window.

        The window start is snapped DOWN to the packed cache's DMA tile
        grid (rows to 8, columns to 16 — ops/pallas/window_gather.py); the
        snap distance is absorbed into the in-window crop offset, so the
        visible ps-patch position ``ws + off`` keeps exactly the sampled
        RandomCrop distribution.  The offset is clamped so the sub-pixel
        shift's circular wrap keeps >= MIN_WRAP_GUARD pixels of guard on
        every side of the crop; the clamp only bites in a <=15-pixel band
        at the far scene edge of coarse levels (documented deviation).
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
        ws_y = int(np.clip(y112 - SNAP_PAD, 0, max(hf - win, 0))) // 8 * 8
        ws_x = int(np.clip(x112 - SNAP_PAD, 0, max(wf - win, 0))) // 16 * 16
        max_off = win - self.ps - EXTRA // 2 - MIN_WRAP_GUARD
        return (ws_y, ws_x, min(int(y112 - ws_y), max_off),
                min(int(x112 - ws_x), max_off))

    def _cut_window(self, scene: dict, f: int, ws_y: int, ws_x: int):
        """Copy one stride-f window at a given start (RNG-free, thread-safe)."""
        win = self.win
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
        return out

    def close(self):
        """Shut down the lazy window-cutter thread pool (also runs via a
        weakref finalizer when the pipeline is garbage collected)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def sample_batch(self, batch_size: int) -> Batch:
        fields = {k: [] for k in ('h', 'v', 'i', 'd', 'gt', 'mpi', 'mask')}
        y_offs, x_offs = [], []

        # draw ALL randomness sequentially first (determinism), then cut
        # windows in a thread pool — the C++ strided_window releases the
        # GIL exactly for this (native/mmlf_native.cpp); the reference gets
        # the same overlap from DataLoader workers (train/cli.py:97-100)
        draws = []
        for _ in range(batch_size):
            idx = int(self.rng.integers(0, len(self.scenes)))
            f = int(self.rng.integers(1, self.max_f + 1))
            ws_y, ws_x, y_off, x_off = self._positions(
                self.scenes[idx]['gt'].shape, f)
            draws.append((idx, f, ws_y, ws_x, y_off, x_off))

        def cut(draw):
            idx, f, ws_y, ws_x, y_off, x_off = draw
            w = self._cut_window(self.scenes[idx], f, ws_y, ws_x)
            return w, y_off, x_off

        # honor --train_num_workers like the reference's DataLoader
        # (train/cli.py:97-100): 0 means synchronous loading (torch
        # convention); threads not processes, because the C++ window
        # cutter releases the GIL
        nw = getattr(self.cfg, 'train_num_workers', None)
        nw = 4 if nw is None else int(nw)
        if batch_size > 1 and nw > 0:
            from concurrent.futures import ThreadPoolExecutor
            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=nw)
                import weakref
                weakref.finalize(self, self._pool.shutdown, wait=False)
            results = list(self._pool.map(cut, draws))
        else:
            results = [cut(d) for d in draws]

        for w, y_off, x_off in results:
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
                color=np.stack([T.random_color_matrix(self.rng)
                                for _ in range(b)]),
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
    # (y_off + EXTRA/2) within the window (see TrainPipeline._positions)
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

class PackedCache(struct.PyTreeNode):
    """Packed tile-aligned scene pyramid in device memory.

    One entry per downsample factor f ∈ {1..max_f} (the reference's
    RandomDownSampling range, mmlf/data/hci4d.py): each level holds every
    (static-shifted) scene at stride f, pre-scaled (gt and MPI disparities
    divided by f), laid out so a training window is a rectangular DMA:

      * ``img[f-1]``: ``(S, Hf, Wf, CI)`` — all four view stacks folded into
        the lane dim, channel order ``stack(4) × view(n) × rgb(3)`` padded
        to a multiple of 128 lanes (CI = 128 for 9 views).  fp32, or bf16
        with ``cache_bf16`` (images only — the model casts to bf16 anyway);
      * ``aux[f-1]``: ``(S, Hf, Wf*8)`` fp32 — per-pixel [gt, mask, 0…];
      * ``mpi[f-1]``: ``(S, Hf, Wf*64)`` fp32 — plane-major K*5 = 60 used.

    The pyramid costs ×(1 + 1/4 + 1/9 + 1/16) ≈ 1.42 the base memory and
    buys stride-free, branch-free window extraction (see
    ops/pallas/window_gather.py).  The full 16-scene HCI training set packs
    to ≈ 4.8 GB fp32 (2.4 GB with ``cache_bf16``) — comfortably in HBM.
    """
    img: Any                 # tuple over levels: (S, Hf, Wf, CI)
    aux: Any                 # tuple over levels: (S, Hf, Wf*8)
    mpi: Any                 # tuple over levels: (S, Hf, Wf*64)
    views: int = struct.field(pytree_node=False, default=9)


class DeviceBatch(NamedTuple):
    """Per-sample window coordinates + augmentation parameters (host RNG)."""
    scene: jnp.ndarray       # (b,) int32 scene index
    factor: jnp.ndarray      # (b,) int32 downsample factor (1-based)
    ws_y: jnp.ndarray        # (b,) int32 window start (level coords, 8-snap)
    ws_x: jnp.ndarray        # (b,) int32 window start (level coords, 16-snap)
    aug: AugParams


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def build_device_cache(scenes, max_f: int = 4, sharding=None,
                       img_dtype=np.float32) -> PackedCache:
    """Pack TrainPipeline scene dicts into the pyramid layout (host numpy,
    one-time) and put the levels on device (replicated across the mesh when
    a sharding is given)."""
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put
    n = scenes[0]['h'].shape[0]
    ci = _round_up(4 * n * 3, 128)

    from ..ops.pallas.window_gather import AUX_CH, MPI_CH

    img_levels, aux_levels, mpi_levels = [], [], []
    for f in range(1, max_f + 1):
        imgs, auxs, mpis = [], [], []
        for s in scenes:
            # (n, Hf, Wf, 3) per stack → (Hf, Wf, n*3), stack-major concat
            planes = []
            for k in ('h', 'v', 'i', 'd'):
                a = np.moveaxis(s[k][:, ::f, ::f], 0, 2)   # (Hf, Wf, n, 3)
                planes.append(a.reshape(a.shape[0], a.shape[1], n * 3))
            hf, wf = planes[0].shape[:2]
            img = np.zeros((hf, wf, ci), np.float32)
            img[..., :4 * n * 3] = np.concatenate(planes, -1)
            imgs.append(img)

            aux = np.zeros((hf, wf, AUX_CH), np.float32)
            aux[..., 0] = s['gt'][::f, ::f] / np.float32(f)
            aux[..., 1] = s['mask'][::f, ::f]
            auxs.append(aux.reshape(hf, wf * AUX_CH))

            m = np.moveaxis(s['mpi'][:, ::f, ::f], 0, 2)   # (Hf, Wf, K, 5)
            m = m.copy()
            m[..., 4] /= np.float32(f)
            k5 = m.shape[2] * 5
            mp = np.zeros((hf, wf, MPI_CH), np.float32)
            mp[..., :k5] = m.reshape(hf, wf, k5)
            mpis.append(mp.reshape(hf, wf * MPI_CH))

        img_levels.append(put(np.stack(imgs).astype(img_dtype)))
        aux_levels.append(put(np.stack(auxs)))
        mpi_levels.append(put(np.stack(mpis)))

    return PackedCache(img=tuple(img_levels), aux=tuple(aux_levels),
                       mpi=tuple(mpi_levels), views=n)


def gather_windows(cache: PackedCache, batch: DeviceBatch,
                   win: int, mesh=None) -> Batch:
    """Extract per-sample windows from the packed pyramid (inside jit) and
    unpack them into the reference's stack layout.

    On a single TPU chip this is the Pallas DMA kernel
    (ops/pallas/window_gather.py); elsewhere the XLA fallback.  GT/MPI
    disparities come back pre-scaled (DownSampling semantics baked into the
    pyramid levels).
    """
    from ..ops.pallas.window_gather import window_gather

    img, aux, mpi = window_gather(
        cache.img, cache.aux, cache.mpi, batch.scene, batch.factor - 1,
        batch.ws_y, batch.ws_x, win, mesh=mesh)

    b = img.shape[0]
    n3 = cache.views * 3

    def stack_of(k):
        s = img[..., k * n3:(k + 1) * n3].astype(jnp.float32)
        s = s.reshape(b, win, win, cache.views, 3)
        return jnp.transpose(s, (0, 3, 1, 2, 4))

    aux = aux.reshape(b, win, win, -1)
    gt = aux[..., 0]
    mask = aux[..., 1].astype(jnp.int32)
    mpi = mpi.reshape(b, win, win, -1)[..., :MAX_PLANES * 5]
    mpi = jnp.transpose(mpi.reshape(b, win, win, MAX_PLANES, 5),
                        (0, 3, 1, 2, 4))
    return Batch(h=stack_of(0), v=stack_of(1), i=stack_of(2), d=stack_of(3),
                 gt=gt, mpi=mpi, mask=mask, aug=batch.aug)


def check_rot_parity(rot_k, accum: int = 1) -> None:
    """Host-side guard for the gather_augment(parity=True) contract:
    within each accum chunk, rot_k[:chunk//2] even and the rest odd.
    Call on the HOST batch (numpy) — a violated contract would silently
    rotate stacks differently from their gt targets inside jit."""
    rot_k = np.asarray(rot_k)
    b = rot_k.shape[0]
    chunk = b // accum if accum > 1 and b % accum == 0 else b
    for c0 in range(0, b, chunk):
        n = min(chunk, b - c0)
        h = n // 2
        bad = (np.any(rot_k[c0:c0 + h] % 2 != 0)
               or np.any(rot_k[c0 + h:c0 + n] % 2 != 1))
        if bad:
            raise ValueError(
                'rotation parity contract violated (first half of each '
                'accum chunk must be even rot_k, second half odd) — was '
                'this batch sampled by DevicePipeline with augmentation '
                'on?')


def gather_augment(cache: PackedCache, batch: DeviceBatch, ps: int,
                   win: int, with_mpi: bool = True, mesh=None,
                   parity: bool = False, fold: bool = False):
    """Fused TPU input path: Pallas DMA window gather + matmul-domain
    augmentation, straight from the packed pyramid to model-ready stacks.

    Equivalent to ``augment_batch(gather_windows(...))`` (asserted in
    tests/test_augment2.py) but never materializes windows in the
    gather-hostile per-view stack layout; see data/augment2.py.

    ``parity=True`` requires a batch sampled with DevicePipeline's
    stratified rotations (first half even rot_k, second half odd — see
    sample_batch); the rotation then costs one static half-batch
    transpose instead of materializing both orientations.

    ``fold=True`` returns the stacks pre-folded to the model layout
    ``(B, ps, ps, n*3)`` (pass ``folded=True`` to FeedForward) — the
    augmentation epilogue emits that layout directly, skipping every
    3-minor-dim intermediate (see augment2.augment_packed).

    :returns: ``(h, v, i, d, gt, mpi, mask)`` with stacks
        ``(B, n, ps, ps, 3)`` fp32 (folded: ``(B, ps, ps, n*3)``).
    """
    from ..ops.pallas.window_gather import window_gather
    from .augment2 import augment_packed, augment_targets

    img, aux, mpi = window_gather(
        cache.img, cache.aux, cache.mpi, batch.scene, batch.factor - 1,
        batch.ws_y, batch.ws_x, win, with_mpi=with_mpi, mesh=mesh)
    h, v, i, d = augment_packed(img, batch.aug, ps, cache.views,
                                parity_split=parity, fold=fold)
    gt, mpi, mask = augment_targets(aux, mpi, batch.aug, ps, MAX_PLANES,
                                    with_mpi, parity_split=parity)
    return h, v, i, d, gt, mpi, mask


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
        img_dtype = jnp.bfloat16 if getattr(cfg, 'cache_bf16', False) \
            else np.float32
        self.cache = build_device_cache(self.scenes, self.max_f, sharding,
                                        img_dtype=img_dtype)

    def _stratified_rot(self, batch_size: int) -> np.ndarray:
        """Rotations with the parity contract gather_augment(parity=True)
        exploits: within each gradient-accumulation microbatch chunk, the
        first half draws EVEN k (0/2) and the second half ODD k (1/3).

        The per-sample marginal stays uniform over {0,1,2,3} and samples
        are independent of their slot, so the augmentation distribution is
        unchanged; only the per-batch parity counts are fixed (a mild,
        documented variance-reduction deviation from iid draws).
        """
        accum = max(1, int(getattr(self.cfg, 'train_accum', 1) or 1))
        chunk = batch_size // accum if accum > 1 and \
            batch_size % accum == 0 else batch_size
        out = np.empty(batch_size, np.int32)
        for c0 in range(0, batch_size, chunk):
            n = min(chunk, batch_size - c0)
            h = n // 2
            out[c0:c0 + h] = self.rng.integers(0, 2, h) * 2
            out[c0 + h:c0 + n] = self.rng.integers(0, 2, n - h) * 2 + 1
        return out

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
                rot_k=self._stratified_rot(batch_size),
                color=np.stack([T.random_color_matrix(self.rng)
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
