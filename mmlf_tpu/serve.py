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
                 -> disparity statistics (+ masked MSE / BadPix(0.07) when
                 the scene ships GT) and the artifact paths written
                 (``result.pfm`` / ``uncert.pfm``, PFM bottom-up convention
                 like the reference writer, reference mmlf/data/hci4d.py:362).

Inference is serialized with a lock — the TPU is single-tenant; concurrent
requests queue instead of wedging the relay.
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
                 train_shift: float = 0.0):
        self.train_shift = float(train_shift)
        self.lock = threading.Lock()
        self.stats = {'requests': 0, 'errors': 0, 'total_s': 0.0,
                      'last_s': None}
        self.fixed_shape = None
        if os.path.isdir(model_path):
            from .export import build_inference
            import jax
            fwd, variables, meta = build_inference(
                model_path, val_ensamble=val_ensamble)
            jfwd = jax.jit(fwd)
            self._call = lambda *stacks: jfwd(variables, *stacks)
            self.meta = meta
        else:
            from .export import load_exported
            self._call, self.meta = load_exported(model_path)
            self.fixed_shape = (self.meta['height'], self.meta['width'])

    def warmup(self, size: int = 0):
        """Compile before the first request: at the artifact's shape, or at
        ``size``² for checkpoint-dir mode (0 = skip; checkpoint mode
        compiles per scene shape on first use anyway)."""
        if self.fixed_shape:
            h, w = self.fixed_shape
        elif size:
            h = w = int(size)
        else:
            return None
        n = self.meta.get('views', self.meta['config']['model_views'])
        z = np.zeros((1, n, h, w, 3), np.float32)
        out = self._call(z, z, z, z)
        np.asarray(out['mean'])
        return h, w

    def infer(self, scene_dir: str, out_dir: str | None = None,
              train_shift: float | None = None) -> dict:
        from .data.hci4d import _pick_gt_pfm, load_scene
        from .data import transforms as T
        from .losses import masked_badpix, masked_mse
        from .ops.masks import create_mask_margin
        from .utils import pfm

        sample = load_scene(scene_dir)
        shift = self.train_shift if train_shift is None else float(train_shift)
        if shift != 0.0:
            sample = T.Shift(shift)(sample)
        h, v, i, d, center, gt, mpi, mask, _ = sample

        if self.fixed_shape and h.shape[1:3] != self.fixed_shape:
            raise ValueError(
                f'artifact is specialized to {self.fixed_shape}, scene is '
                f'{h.shape[1:3]} — export at this shape or serve the '
                f'checkpoint directory instead')

        t0 = time.time()
        with self.lock:
            out = self._call(*(np.asarray(s[None]) for s in (h, v, i, d)))
            mean = np.asarray(out['mean'])[0]
        runtime = time.time() - t0

        resp = {
            'scene': os.path.basename(os.path.abspath(scene_dir)),
            'runtime_s': round(runtime, 4),
            'shape': list(mean.shape),
            'disp': {'min': float(mean.min()), 'max': float(mean.max()),
                     'mean': float(mean.mean())},
        }

        if _pick_gt_pfm(scene_dir, (9, 9)) is not None:
            m = np.asarray(create_mask_margin(gt[None].shape, 15))
            out_d = {'mean': mean[None]}
            resp['mse'] = float(masked_mse(out_d, gt[None], m))
            resp['badpix_007'] = float(masked_badpix(out_d, gt[None], m))

        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            rp = os.path.join(out_dir, 'result.pfm')
            pfm.save(rp, np.flip(mean.astype(np.float32), 0).copy())
            resp['artifacts'] = [rp]
            logvar = out.get('logvar')
            if logvar is not None:
                up = os.path.join(out_dir, 'uncert.pfm')
                pfm.save(up, np.flip(
                    np.asarray(logvar)[0].astype(np.float32), 0).copy())
                resp['artifacts'].append(up)
        return resp


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
                self._send(200, {
                    'status': 'ok',
                    'fixed_shape': engine.fixed_shape,
                    'val_ensamble': engine.meta.get('val_ensamble', False),
                    'model': {k: cfg.get(k) for k in
                              ('model_chs', 'model_uncert', 'model_discrete',
                               'model_unet', 'model_views')},
                })
            elif self.path == '/stats':
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
            engine.stats['requests'] += 1
            try:
                ln = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(ln) or b'{}')
                resp = engine.infer(req['scene_dir'],
                                    req.get('out_dir'),
                                    req.get('train_shift'))
                engine.stats['total_s'] += resp['runtime_s']
                engine.stats['last_s'] = resp['runtime_s']
                self._send(200, resp)
            except (KeyError, ValueError, OSError) as e:
                engine.stats['errors'] += 1
                self._send(400, {'error': f'{type(e).__name__}: {e}'})

    return ThreadingHTTPServer((host, port), Handler)


@click.command()
@click.argument('model', type=click.Path(exists=True))
@click.option('--host', default='127.0.0.1')
@click.option('--port', default=8417)
@click.option('--val_ensamble', is_flag=True,
              help='Checkpoint-dir mode: serve the shift ensemble')
@click.option('--train_shift', default=0.0, type=float,
              help='Default static re-centering shift applied to scenes')
@click.option('--warmup_size', default=0,
              help='Checkpoint-dir mode: compile for this scene size at '
                   'startup (artifacts always warm at their exported shape)')
@click.option('--no_warmup', is_flag=True,
              help='Skip the startup compile')
@click.option('--jax_cache', default='', envvar='MMLF_JAX_CACHE',
              help='Persistent XLA compilation-cache directory')
def main(model, host, port, val_ensamble, train_shift, warmup_size,
         no_warmup, jax_cache):
    """Serve depth inference from an export artifact or checkpoint dir."""
    if jax_cache:
        from .utils.jaxcache import enable_compilation_cache
        enable_compilation_cache(jax_cache)
    engine = InferenceEngine(model, val_ensamble=val_ensamble,
                             train_shift=train_shift)
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
