"""Inference server (TPU-native extension).

``python -m mmlf_tpu.serve MODEL [--port 8417]`` serves light-field depth
inference over HTTP from either

* an AOT export artifact (``mmlf_tpu.export`` — fixed scene shape, loads
  without model source and compiles instantly from the embedded StableHLO), or
* a checkpoint directory (``checkpoint.msgpack`` or a reference
  ``checkpoint.pt`` — jit-compiles one program per scene shape, so pairing
  with ``--jax_cache`` makes restarts warm).

The reference has no serving story (its inference is the eager validate loop,
reference mmlf/validate/cli.py:249-331); this is the deployment surface: a
resident process that owns the TPU, keeps the compiled program warm, and
turns scene directories into disparity maps.

Endpoints (JSON; stdlib http.server, zero dependencies):
  GET  /healthz  -> model/meta info, ready flag
  GET  /stats    -> request counters + latency aggregates
  POST /infer    {"scene_dir": DIR[, "out_dir": DIR][, "train_shift": S]}
                 or {"scene_dirs": [DIR, ...], ...} for a batched call
                 -> disparity statistics (+ masked MSE / BadPix(0.07) when
                 the scene ships GT) and the artifact paths written
                 (``result.pfm`` / ``uncert.pfm``, PFM bottom-up convention
                 like the reference writer, reference mmlf/data/hci4d.py:362).
                 Multi-scene requests write per-scene subdirectories of
                 ``out_dir`` and return a ``scenes`` list.

Inference is serialized with a lock — the TPU is single-tenant; concurrent
requests queue instead of wedging the relay.

Low-transfer ingest: artifacts exported with ``mmlf-export --u8`` (or
checkpoint-dir mode with ``--u8``) ship the RAW uint8 view bytes to the
device and normalize + apply the ``train_shift`` re-centering there — 4×
less host→device traffic, which dominates remote-attached (relay) serving.

The server binds loopback by default and has NO authentication; if exposed
beyond localhost (``--host``), set ``--data_root`` so scene/output paths are
confined to one directory tree.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import click
import numpy as np


class InferenceEngine:
    """Owns the model (artifact or checkpoint) and runs scenes through it."""

    def __init__(self, model_path: str, val_ensamble: bool = False,
                 train_shift: float = 0.0, data_root: str = '',
                 u8: bool = False, decode_threads: int = 8,
                 calibration: str = ''):
        self.train_shift = float(train_shift)
        self.decode_threads = int(decode_threads)
        self.data_root = (os.path.realpath(data_root) if data_root else '')
        self.lock = threading.Lock()           # serializes TPU calls
        self.stats_lock = threading.Lock()     # guards the counters
        self.stats = {'requests': 0, 'errors': 0, 'total_s': 0.0,
                      'last_s': None}
        self.fixed_shape = None
        self.fixed_batch = None                # artifact mode only
        if os.path.isdir(model_path):
            from .export import build_inference
            import jax
            cal = None
            if calibration:
                with open(calibration) as f:
                    cal = json.load(f)
            fwd, variables, meta = build_inference(
                model_path, val_ensamble=val_ensamble, u8=u8,
                calibration=cal)
            # pin the weights in HBM: numpy args to a jitted fn are
            # re-transferred EVERY call (~18 MB/request through the relay)
            variables = jax.device_put(variables)
            jfwd = jax.jit(fwd)
            self._call = lambda *args: jfwd(variables, *args)
            self.meta = meta
        else:
            from .export import load_exported
            self._call, self.meta = load_exported(model_path)
            if self.meta.get('tiled'):
                # shape-polymorphic artifact: any scene shape; the canvas
                # pad + tile-position table are built per request
                self.fixed_shape = None
            else:
                self.fixed_shape = (self.meta['height'], self.meta['width'])
            self.fixed_batch = int(self.meta.get('batch', 1))
            if u8 and not self.meta.get('u8', False):
                # --u8 cannot retrofit a compiled fp32 artifact; failing
                # loudly beats silently serving at fp32 transfer cost
                raise ValueError(
                    'artifact was not exported with --u8; re-export with '
                    'mmlf-export --u8 (artifacts carry the ingest mode '
                    'in their meta)')
        # u8 ingest: raw uint8 stacks + a trailing f32 shift scalar; the
        # device normalizes and re-centers (export.py build_inference)
        self.u8 = bool(self.meta.get('u8', False))
        self.tiled = int(self.meta.get('tiled', 0))
        self.halo = int(self.meta.get('halo', 0))
        self.sdim = self.meta.get('sdim', {})
        self.views = int(self.meta.get(
            'views', self.meta['config']['model_views']))

    def _tile_args(self, stacks, ht: int, wt: int):
        """Canvas-pad the stacks and append the tile-position table for a
        shape-polymorphic (tiled) artifact (export.py ``--tiled``)."""
        from .validate.tiling import tile_positions
        t = self.tiled
        win = t + 2 * self.halo
        if ht < win or wt < win:
            raise ValueError(
                f'scene {ht}x{wt} is smaller than the tile window {win} '
                f'(tile {t} + 2x halo {self.halo}); use a fixed-shape '
                f'artifact for scenes this small')
        hc, wc = -(-ht // t) * t, -(-wt // t) * t
        # the symbolic canvas requires at least the window per axis
        smin = max(2, -(-win // t)) * t
        hc, wc = max(hc, smin), max(wc, smin)
        stacks = [np.pad(a, ((0, 0), (0, 0), (0, hc - ht), (0, wc - wt),
                             (0, 0))) for a in stacks]
        pos = tile_positions(ht, wt, t, self.halo,
                             pad_to=(hc // t) * (wc // t))
        return stacks + [pos.astype(np.int32)]

    def _crop(self, arr, n: int, key: str, ht: int, wt: int):
        """Batch-trim + (for tiled artifacts) canvas-crop one output."""
        arr = np.asarray(arr)[:n]
        if self.tiled:
            d = int(self.sdim.get(key, 1))
            idx = (slice(None),) * d + (slice(0, ht), slice(0, wt))
            arr = arr[idx]
        return arr

    def warmup(self, size: int = 0):
        """Compile before the first request: at the artifact's shape, or at
        ``size``² for checkpoint-dir/tiled mode (0 = skip; checkpoint mode
        compiles per scene shape on first use anyway)."""
        if self.fixed_shape:
            h, w = self.fixed_shape
        elif size:
            h = w = int(size)
        else:
            return None
        z = np.zeros((self.fixed_batch or 1, self.views, h, w, 3),
                     np.uint8 if self.u8 else np.float32)
        args = [z, z, z, z]
        if self.tiled:
            args = self._tile_args(args, h, w)
        if self.u8:
            args.append(np.float32(0.0))
        out = self._call(*args)
        np.asarray(out['mean'])
        return h, w

    def _check_root(self, path: str, what: str) -> str:
        if self.data_root:
            real = os.path.realpath(path)
            if os.path.commonpath([real, self.data_root]) != self.data_root:
                raise ValueError(f'{what} {path!r} is outside --data_root')
        return path

    def infer(self, scene_dir: str | None = None,
              out_dir: str | None = None,
              train_shift: float | None = None,
              scene_dirs: list | None = None) -> dict:
        from .data.hci4d import _pick_gt_pfm, load_scene
        from .data import transforms as T
        from .losses import masked_badpix, masked_mse
        from .ops.masks import create_mask_margin
        from .utils import pfm

        single = scene_dirs is None
        if single:
            if not scene_dir:
                raise ValueError('scene_dir (or scene_dirs) is required')
            scene_dirs = [scene_dir]
        elif not isinstance(scene_dirs, (list, tuple)) or not scene_dirs \
                or not all(isinstance(s, str) for s in scene_dirs):
            raise ValueError('scene_dirs must be a non-empty list of paths')
        if out_dir:
            self._check_root(out_dir, 'out_dir')

        shift = self.train_shift if train_shift is None else float(train_shift)
        nviews = (self.views, self.views)
        samples = []
        for sd in scene_dirs:
            self._check_root(sd, 'scene_dir')
            # the 23×23 texture mask is never consumed here — skip its cost
            sample = load_scene(sd, nviews=nviews, texture_mask=False,
                                raw_views=self.u8,
                                threads=self.decode_threads)
            if self.u8:
                if shift != 0.0:
                    # stacks stay uint8 (device shifts them); GT and the
                    # MPI disparity channel are corrected here so the
                    # sample obeys the same re-centered contract as
                    # T.Shift (ops/shift.py).  At shift 0 this is a no-op
                    # — skip the per-request MPI copy like the fp32 branch
                    mpi = sample[6].copy()
                    mpi[..., 4] -= np.float32(shift)
                    sample = sample[:5] + (sample[5] - np.float32(shift),
                                           mpi) + sample[7:]
            elif shift != 0.0:
                sample = T.Shift(shift)(sample)
            samples.append(sample)

        shapes = {s[0].shape for s in samples}
        if len(shapes) > 1:
            raise ValueError('scenes in one request must share a shape, '
                             f'got {sorted(map(str, shapes))}')
        spatial = samples[0][0].shape[1:3]
        if self.fixed_shape and spatial != self.fixed_shape:
            raise ValueError(
                f'artifact is specialized to {self.fixed_shape}, scene is '
                f'{spatial} — export at this shape or serve the '
                f'checkpoint directory instead')
        n = len(samples)
        if self.fixed_batch is not None and n > self.fixed_batch:
            raise ValueError(f'artifact batch is {self.fixed_batch}, '
                             f'request has {n} scenes')

        def batch_stack(j):
            arr = np.stack([np.asarray(s[j]) for s in samples])
            if self.fixed_batch and arr.shape[0] < self.fixed_batch:
                pad = np.zeros((self.fixed_batch - arr.shape[0],)
                               + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad])
            return arr

        args = [batch_stack(j) for j in range(4)]
        ht, wt = spatial
        if self.tiled:
            args = self._tile_args(args, ht, wt)
        if self.u8:
            args.append(np.float32(shift))
        t0 = time.time()
        with self.lock:
            out = self._call(*args)
            mean = self._crop(out['mean'], n, 'mean', ht, wt)
        runtime = time.time() - t0
        logvar = out.get('logvar')
        logvar = None if logvar is None else self._crop(logvar, n, 'logvar',
                                                        ht, wt)

        resps = []
        for k, (sd, sample) in enumerate(zip(scene_dirs, samples)):
            gt = sample[5]
            mk = mean[k]
            resp = {
                'scene': os.path.basename(os.path.abspath(sd)),
                'shape': list(mk.shape),
                'disp': {'min': float(mk.min()), 'max': float(mk.max()),
                         'mean': float(mk.mean())},
            }
            if _pick_gt_pfm(sd, nviews) is not None:
                m = np.asarray(create_mask_margin(gt[None].shape, 15))
                out_d = {'mean': mk[None]}
                resp['mse'] = float(masked_mse(out_d, gt[None], m))
                resp['badpix_007'] = float(masked_badpix(out_d, gt[None], m))
            if out_dir:
                dst = out_dir if single else os.path.join(out_dir,
                                                          resp['scene'])
                os.makedirs(dst, exist_ok=True)
                rp = os.path.join(dst, 'result.pfm')
                pfm.save(rp, np.flip(mk.astype(np.float32), 0).copy())
                resp['artifacts'] = [rp]
                if logvar is not None:
                    up = os.path.join(dst, 'uncert.pfm')
                    pfm.save(up, np.flip(
                        logvar[k].astype(np.float32), 0).copy())
                    resp['artifacts'].append(up)
            resps.append(resp)

        if single:
            return dict(resps[0], runtime_s=round(runtime, 4))
        return {'runtime_s': round(runtime, 4), 'scenes': resps}


def make_server(engine: InferenceEngine, host: str = '127.0.0.1',
                port: int = 8417) -> ThreadingHTTPServer:

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet; /stats has the numbers
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                cfg = engine.meta.get('config', {})
                payload = {
                    'status': 'ok',
                    'fixed_shape': engine.fixed_shape,
                    'val_ensamble': engine.meta.get('val_ensamble', False),
                    'model': {k: cfg.get(k) for k in
                              ('model_chs', 'model_uncert', 'model_discrete',
                               'model_unet', 'model_views')},
                }
                if payload['val_ensamble']:
                    # min-logvar member selection fails SILENTLY on a
                    # miscalibrated uncertainty head (validate/calibrate.py)
                    # — an ensemble that was never checked must say so
                    cal = engine.meta.get('calibration')
                    payload['calibration'] = cal if cal is not None else {
                        'status': 'unchecked',
                        'hint': 'run the validate CLI with --val_ensamble '
                                '--val_save_calibration and re-export with '
                                '--calibration (or serve --calibration)',
                    }
                self._send(200, payload)
            elif self.path == '/stats':
                with engine.stats_lock:
                    s = dict(engine.stats)
                n = max(1, s['requests'] - s['errors'])
                s['avg_s'] = round(s['total_s'] / n, 4)
                self._send(200, s)
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            if self.path != '/infer':
                self._send(404, {'error': f'unknown path {self.path}'})
                return
            with engine.stats_lock:
                engine.stats['requests'] += 1
            try:
                ln = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(ln) or b'{}')
                if not isinstance(req, dict):
                    raise ValueError('request body must be a JSON object')
                resp = engine.infer(req.get('scene_dir'),
                                    req.get('out_dir'),
                                    req.get('train_shift'),
                                    req.get('scene_dirs'))
                with engine.stats_lock:
                    engine.stats['total_s'] += resp['runtime_s']
                    engine.stats['last_s'] = resp['runtime_s']
                self._send(200, resp)
            except (KeyError, TypeError, ValueError, OSError) as e:
                with engine.stats_lock:
                    engine.stats['errors'] += 1
                self._send(400, {'error': f'{type(e).__name__}: {e}'})

    return ThreadingHTTPServer((host, port), Handler)


@click.command()
@click.argument('model', type=click.Path(exists=True))
@click.option('--host', default='127.0.0.1')
@click.option('--port', default=8417)
@click.option('--val_ensamble', is_flag=True,
              help='Checkpoint-dir mode: serve the shift ensemble')
@click.option('--u8', is_flag=True,
              help='Checkpoint-dir mode: low-transfer ingest — ship raw '
                   'uint8 views and normalize + re-center on device '
                   '(artifacts carry this in their meta instead)')
@click.option('--train_shift', default=0.0, type=float,
              help='Default static re-centering shift applied to scenes')
@click.option('--decode_threads', default=8,
              help='Thread-pool size for the per-scene PNG view decode '
                   '(PIL releases the GIL; 0 = serial)')
@click.option('--data_root', default='', type=click.Path(),
              help='Confine scene_dir/out_dir paths to this directory tree '
                   '(REQUIRED whenever --host is not loopback; the API has '
                   'no authentication)')
@click.option('--calibration', default=None,
              type=click.Path(exists=True, dir_okay=False),
              help='Checkpoint-dir ensemble mode: ESE calibration JSON '
                   'from the validate CLI (--val_save_calibration); guard '
                   'scores show on /healthz, fitted member offsets apply '
                   'to selection/posterior')
@click.option('--warmup_size', default=0,
              help='Checkpoint-dir mode: compile for this scene size at '
                   'startup (artifacts always warm at their exported shape)')
@click.option('--no_warmup', is_flag=True,
              help='Skip the startup compile')
@click.option('--jax_cache', default='', envvar='MMLF_JAX_CACHE',
              help='Persistent XLA compilation-cache directory')
def main(model, host, port, val_ensamble, u8, train_shift, decode_threads,
         data_root, calibration, warmup_size, no_warmup, jax_cache):
    """Serve depth inference from an export artifact or checkpoint dir."""
    if host not in ('127.0.0.1', 'localhost', '::1') and not data_root:
        # an unauthenticated API that reads/writes caller-supplied paths
        # must not face a network without path confinement
        raise click.UsageError(
            f'--host {host} is not loopback: the API has no '
            f'authentication, so --data_root is required to confine '
            f'scene/output paths')
    if jax_cache:
        from .utils.jaxcache import enable_compilation_cache
        enable_compilation_cache(jax_cache)
    engine = InferenceEngine(model, val_ensamble=val_ensamble,
                             train_shift=train_shift, data_root=data_root,
                             u8=u8, decode_threads=decode_threads,
                             calibration=calibration)
    if not no_warmup:
        shape = engine.warmup(warmup_size)
        if shape:
            print(f'warmed up at {shape[0]}x{shape[1]}')
    server = make_server(engine, host, port)
    print(f'serving {model} on http://{host}:{server.server_address[1]}')
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == '__main__':
    sys.exit(main())
