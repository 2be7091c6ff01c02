"""Measure the shape-polymorphic tiled artifact on hardware (VERDICT r3
item 4 done-criterion): ONE exported artifact serves a 512² and a 1024²
scene; outputs cross-checked against the untiled forward (512²) and the
validate CLI's --val_tile path (1024²); s/scene recorded for STATUS.

Run:  python scripts/tiled_export_probe.py [CKPT_DIR]
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

ROOT = '/tmp/parity'


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else f'{ROOT}/upr70_s0w'
    shift = 2.5

    import jax
    print(f'device: {jax.devices()[0]}', flush=True)
    from mmlf_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(os.environ.get('MMLF_JAX_CACHE',
                                            '/tmp/mmlf_jax_cache'))

    data1024 = f'{ROOT}/data1024'
    if not os.path.exists(os.path.join(data1024, 'big_00')):
        from mmlf_tpu.data.synth import generate_dataset
        generate_dataset(data1024, scenes=1, size=1024, seed=7,
                         disp_center=shift, layers=4)
        os.rename(os.path.join(data1024, 'scene_00'),
                  os.path.join(data1024, 'big_00'))
    scene512 = f'{ROOT}/data/val/scene_00'
    scene1024 = f'{data1024}/big_00'

    art = f'{ROOT}/tiled_upr.mmlf'
    if not os.path.exists(art):
        from mmlf_tpu.export import export_inference
        t0 = time.time()
        blob = export_inference(ckpt, 0, 0, tiled=256)
        with open(art, 'wb') as f:
            f.write(blob)
        print(f'exported {art}: {len(blob) / 1e6:.1f} MB in '
              f'{time.time() - t0:.1f}s', flush=True)

    from mmlf_tpu.serve import InferenceEngine
    eng = InferenceEngine(art, train_shift=shift)
    print(f'tiled={eng.tiled} halo={eng.halo} fixed_shape={eng.fixed_shape}',
          flush=True)

    results = {}
    for name, sd in [('512', scene512), ('1024', scene1024)]:
        out_dir = f'{ROOT}/tiled_out_{name}'
        for attempt in ('cold', 'warm'):
            t0 = time.time()
            r = eng.infer(scene_dir=sd, out_dir=out_dir)
            wall = time.time() - t0
            print(f'{name}² {attempt}: {wall:.2f}s wall '
                  f'(device call {r["runtime_s"]}s), mse {r.get("mse")}',
                  flush=True)
        results[name] = r

    # cross-check 512² against the untiled full-scene forward
    from mmlf_tpu.data import transforms as T
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.export import build_inference
    from mmlf_tpu.utils import pfm
    import jax.numpy as jnp

    valset = HCI4D(f'{ROOT}/data/val', transform=T.Shift(shift))
    h, v, i, d, center, gt, mpi, mask, index = valset[0]
    fwd, variables, _ = build_inference(ckpt)
    full = jax.jit(fwd)(variables, *[jnp.asarray(x[None])
                                     for x in (h, v, i, d)])
    tiled512 = np.flip(pfm.load(f'{ROOT}/tiled_out_512/result.pfm')[0], 0)
    d512 = np.abs(np.asarray(full['mean'])[0] - tiled512)
    print(f'512² tiled-artifact vs untiled forward: max|Δ| {d512.max():.3e}'
          f'  mean {d512.mean():.3e}', flush=True)

    # cross-check 1024² against the validate CLI --val_tile path (copy the
    # checkpoint so save_batch artifacts don't collide with the 512² runs)
    vdir = f'{ROOT}/tiled_vali_ckpt'
    os.makedirs(vdir, exist_ok=True)
    for f in ('checkpoint.msgpack', 'hyper_parameters.json'):
        src = os.path.join(ckpt, f)
        if os.path.exists(src):
            shutil.copy(src, vdir)
    from mmlf_tpu.validate.cli import run_validation
    t0 = time.time()
    metrics = run_validation(vdir, data1024, train_shift=shift,
                             val_tile=256)
    print(f'validate CLI --val_tile 256 on 1024²: {time.time() - t0:.1f}s, '
          f'mse {metrics["mse"]:.6f}', flush=True)
    vali = np.flip(pfm.load(f'{vdir}/scenes/big_00/result.pfm')[0], 0)
    tiled1024 = np.flip(pfm.load(f'{ROOT}/tiled_out_1024/result.pfm')[0], 0)
    d1024 = np.abs(vali - tiled1024)
    print(f'1024² tiled-artifact vs validate CLI --val_tile: '
          f'max|Δ| {d1024.max():.3e}  mean {d1024.mean():.3e}', flush=True)
    print(json.dumps({'artifact_mse_512': results['512'].get('mse'),
                      'artifact_mse_1024': results['1024'].get('mse'),
                      'max_delta_512_vs_untiled': float(d512.max()),
                      'max_delta_1024_vs_validate': float(d1024.max())}))


if __name__ == '__main__':
    main()
