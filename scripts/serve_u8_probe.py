"""Measure the u8 serving ingest win on real hardware.

Exports the full chs=70 UPR inference program twice from the same
checkpoint — the fp32 artifact and the --u8 low-transfer artifact — then
serves one 512^2 scene through each InferenceEngine in the SAME process
(one TPU claim) and reports the end-to-end /infer latency split.

The device call of remote-attached (relay) serving is dominated by
shipping the four view stacks; fp32 ships 4 x H x W x views x 3 x 4 B
(~113 MB at 512^2/9 views), u8 ships the raw bytes (~28 MB) and
normalizes + re-centers on device (export.py build_inference u8=True).

Usage: python scripts/serve_u8_probe.py [CKPT_DIR] [SCENE_DIR] [N_CALLS]
                                        [TRAIN_SHIFT]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else '/tmp/parity/upr70_s0w'
    scene = sys.argv[2] if len(sys.argv) > 2 else \
        '/tmp/parity/data/val/scene_00'
    n_calls = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    shift = float(sys.argv[4]) if len(sys.argv) > 4 else 2.5

    from mmlf_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache('/tmp/mmlf_jax_cache')

    from mmlf_tpu.export import export_inference
    from mmlf_tpu.serve import InferenceEngine

    results = {}
    for mode, u8 in (('fp32', False), ('u8', True)):
        t0 = time.time()
        blob = export_inference(ckpt, 512, 512, platforms=('tpu',), u8=u8)
        path = f'/tmp/u8probe_{mode}.mmlf'
        with open(path, 'wb') as f:
            f.write(blob)
        print(f'[{mode}] exported {len(blob) / 1e6:.1f} MB '
              f'in {time.time() - t0:.1f}s', flush=True)

        eng = InferenceEngine(path)
        t0 = time.time()
        eng.warmup()
        print(f'[{mode}] warmup (compile) {time.time() - t0:.1f}s',
              flush=True)

        # host scene load alone (decode + stack assembly, engine settings)
        t0 = time.time()
        from mmlf_tpu.data.hci4d import load_scene
        load_scene(scene, texture_mask=False, raw_views=u8,
                   threads=eng.decode_threads)
        t_load = time.time() - t0

        walls, devs = [], []
        resp = None
        for _ in range(n_calls):
            t0 = time.time()
            resp = eng.infer(scene, train_shift=shift)
            walls.append(time.time() - t0)
            devs.append(resp['runtime_s'])
        results[mode] = {
            'wall_s': round(float(np.median(walls)), 3),
            'device_call_s': round(float(np.median(devs)), 3),
            'host_load_s': round(t_load, 3),
            'mse': resp.get('mse'),
            'badpix_007': resp.get('badpix_007'),
        }
        print(f'[{mode}] {results[mode]}', flush=True)

    if results['fp32']['mse'] is not None:
        d = abs(results['fp32']['mse'] - results['u8']['mse'])
        print(f'mse delta fp32 vs u8: {d:.2e}', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
