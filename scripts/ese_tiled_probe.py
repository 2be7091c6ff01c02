"""Measure the ENSEMBLE tiled artifact on hardware (VERDICT r4 missing #5).

Round 4 proved hardware bit-identity for the UPR tiled artifact only; the
ESE tiled export rested on the analytic halo argument (export.py: halo +=
ceil(max|disp|)+1) plus round 3's validate-path measurement.  This probe
closes the gap on the exported composition itself:

  1. export ``--tiled TILE --val_ensamble --u8`` from CKPT (the full
     70-member scanned ensemble inside the shape-polymorphic tiled
     program, uint8 ingest);
  2. serve one 512^2 scene through the artifact;
  3. run the validate CLI on the SAME checkpoint over the same scene,
     (a) with ``--val_tile TILE`` (expected: bit-identical — same
     canonical-canvas program; u8 ingest is exact for PNG views) and
     (b) untiled (expected: the small systematic bf16-reorder delta the
     UPR comparison showed, r4 item 4);
  4. print interior (margin-15) and full-image |Δdisp| for both, plus the
     masked-MSE values.

Usage:  python scripts/ese_tiled_probe.py CKPT_DIR SCENE_DIR [TILE]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def load_result(ckpt: str, scene_name: str):
    # the checkpoint dir may carry scenes/ trees from earlier validate
    # runs — read exactly this scene's artifact
    from mmlf_tpu.utils import pfm
    p = os.path.join(ckpt, 'scenes', scene_name, 'result.pfm')
    assert os.path.exists(p), p
    return np.flip(pfm.load(p)[0], 0).copy()


def delta_report(tag, a, b, margin=15):
    d = np.abs(a - b)
    interior = d[margin:-margin, margin:-margin]
    print(f'{tag}: interior max|Δ| {interior.max():.3e} '
          f'mean {interior.mean():.3e}; full max {d.max():.3e}', flush=True)
    return {'interior_max': float(interior.max()),
            'interior_mean': float(interior.mean()),
            'full_max': float(d.max())}


def main():
    ckpt = sys.argv[1]
    scene = sys.argv[2]
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    work = '/tmp/parity/ese_tiled_probe'
    os.makedirs(work, exist_ok=True)
    from mmlf_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()          # $MMLF_JAX_CACHE when set

    # one-scene dataset for the validate runs
    ds = os.path.join(work, 'ds')
    os.makedirs(ds, exist_ok=True)
    link = os.path.join(ds, os.path.basename(os.path.abspath(scene)))
    if not os.path.exists(link):
        os.symlink(os.path.abspath(scene), link)

    from mmlf_tpu.export import export_inference
    from mmlf_tpu.serve import InferenceEngine

    art = os.path.join(work, 'ese_tiled_u8.mmlf')
    if not os.path.exists(art):
        t0 = time.time()
        blob = export_inference(ckpt, 0, 0, val_ensamble=True, u8=True,
                                tiled=tile)
        open(art, 'wb').write(blob)
        print(f'exported {art}: {len(blob) / 1e6:.1f} MB '
              f'in {time.time() - t0:.1f}s', flush=True)

    eng = InferenceEngine(art, train_shift=2.5)
    for attempt in ('cold', 'warm'):
        t0 = time.time()
        r = eng.infer(scene_dir=scene, out_dir=os.path.join(work, 'art'))
        print(f'artifact {attempt}: {time.time() - t0:.2f}s wall, '
              f'mse {r.get("mse"):.6f} badpix {r.get("badpix_007"):.4f}',
              flush=True)
    from mmlf_tpu.utils import pfm
    art_res = np.flip(pfm.load(os.path.join(work, 'art',
                                            'result.pfm'))[0], 0).copy()

    sname = os.path.basename(os.path.abspath(scene))
    from mmlf_tpu.validate.cli import run_validation
    print('validate CLI --val_tile ESE...', flush=True)
    res_t = run_validation(ckpt, ds, val_ensamble=True, train_shift=2.5,
                           val_tile=tile)
    cli_tiled = load_result(ckpt, sname)

    print('validate CLI untiled ESE...', flush=True)
    res_u = run_validation(ckpt, ds, val_ensamble=True, train_shift=2.5)
    cli_untiled = load_result(ckpt, sname)

    out = {
        'artifact_mse': r.get('mse'),
        'cli_tiled_mse': res_t['mse'],
        'cli_untiled_mse': res_u['mse'],
        'vs_cli_tiled': delta_report('artifact vs CLI --val_tile',
                                     art_res, cli_tiled),
        'vs_cli_untiled': delta_report('artifact vs CLI untiled',
                                       art_res, cli_untiled),
    }
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
