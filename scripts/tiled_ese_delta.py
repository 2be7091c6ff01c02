"""Quantify the tiled-ensemble deviation (VERDICT r2 weak #3).

Tiled inference is exact for plain heads (halo >= receptive field), but
the ensemble's sub-pixel EPI shift wraps circularly inside the tile halo
instead of the image border — a deviation that was argued, never
measured.  This runs the FULL shift ensemble tiled vs untiled on one
512² scene with a trained UPR checkpoint and reports max/mean |Δdisp|
and the metric deltas.

Run: PYTHONPATH=... python scripts/tiled_ese_delta.py CKPT DATASET [TILE]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    ckpt = sys.argv[1]
    dataset = sys.argv[2]
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    import jax.numpy as jnp

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import pad_mpi
    from mmlf_tpu.data import transforms as T
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.utils.fold_bn import fold_batchnorm
    from mmlf_tpu.validate.cli import load_model_state, make_scene_eval

    variables, kwargs = load_model_state(ckpt)
    kwargs.update({'model_discrete': False, 'val_disp_min': -3.5,
                   'val_disp_max': 3.5, 'train_shift': 2.5,
                   'val_ensamble': True})
    cfg = Config.from_dict(kwargs)
    variables = fold_batchnorm(variables)
    cfg = Config.from_dict({**cfg.to_dict(), 'model_no_batchnorm': True})
    model = FeedForward.from_config(cfg)
    kwargs['val_ensamble'] = True

    valset = HCI4D(dataset, transform=T.Shift(2.5))
    h, v, ii, d, center, gt, mpi, _, index = valset[0]
    stacks = [jnp.asarray(x[None]) for x in (h, v, ii, d)]
    gt_j = jnp.asarray(gt[None])
    mpi_j = jnp.asarray(pad_mpi(mpi)[None])

    results = {}
    for vt in (0, tile):
        ev = make_scene_eval(model, cfg, kwargs, True, -3.5, 3.5, 0.1,
                             15, val_tile=vt)
        t0 = time.time()
        out, met = ev(variables, *stacks, gt_j, mpi_j)
        met = jax.tree_util.tree_map(float, met)
        mean = np.asarray(out['mean'])
        print(f'val_tile={vt}: {time.time()-t0:.1f}s  mse={met["mse"]:.6f}'
              f'  badpix={met["bad_pix"]:.6f}  kld={met["kld"]:.4f}'
              f'  nll={met["nll"]:.4f}', flush=True)
        results[vt] = (mean, met)

    m0, met0 = results[0]
    m1, met1 = results[tile]
    delta = np.abs(m1 - m0)
    # interior (the margin-15 mask region used by the metrics)
    dint = delta[:, 15:-15, 15:-15]
    print(f'|Δdisp|: max={delta.max():.6f} mean={delta.mean():.6f} '
          f'interior max={dint.max():.6f} mean={dint.mean():.6f}',
          flush=True)
    for k in met0:
        print(f'Δ{k} = {met1[k] - met0[k]:+.6g}', flush=True)


if __name__ == '__main__':
    main()
