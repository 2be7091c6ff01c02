"""ESE quality diagnosis (VERDICT r1 item 5).

Round 1 observed the ensemble's min-logvar selection underperforming the
bare UPR model on shift-augmented synthetic scenes (docs/NEXT.md #5); the
reference claims ESE improves accuracy (reference mmlf/model/ensamble.py,
paper arXiv:2203.16542).  This script quantifies, on a trained UPR
checkpoint:

 1. **selection quality** — masked MSE of bare UPR vs ESE (min-logvar
    member) vs the per-pixel ORACLE member (min |error|, the selection
    upper bound);
 2. **logvar calibration** — per-pixel rank correlation between member
    logvar and member |error| across the 70-member grid (selection can
    only work if logvar orders members like error does);
 3. **coverage** — mean logvar / mean |error| as a function of the
    re-centered disparity each member presents to the trunk
    (gt + shift_k), vs the disparity range the trunk was trained on
    (RandomShift ±1 around 0);
 4. **reference cross-check** — our ESE vs the reference torch Ensamble
    with the SAME trained weights (flax→torch reverse conversion) on a
    crop: member means/logvars and the selected output must agree, proving
    any remaining quality gap is a property of the method/data, not of
    this implementation.

Usage:
  python scripts/ese_diag.py CKPT_DIR DATASET [--train_shift 2.5]
      [--scenes 2] [--crop 64] [--no-torch]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, '.')


def rankcorr(a, b):
    """Mean Spearman rank correlation along axis 0 (members)."""
    def ranks(x):
        order = np.argsort(x, axis=0)
        rk = np.empty_like(order)
        member_idx = np.arange(x.shape[0]).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        np.put_along_axis(rk, order, member_idx, axis=0)
        return rk.astype(np.float32)
    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean(0)
    rb -= rb.mean(0)
    denom = np.sqrt((ra ** 2).sum(0) * (rb ** 2).sum(0)) + 1e-9
    return (ra * rb).sum(0) / denom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt')
    ap.add_argument('dataset')
    ap.add_argument('--train_shift', type=float, default=2.5)
    ap.add_argument('--scenes', type=int, default=2)
    ap.add_argument('--crop', type=int, default=64)
    ap.add_argument('--no-torch', action='store_true')
    ap.add_argument('--cpu', action='store_true',
                    help='force JAX onto CPU (leave the TPU alone)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from mmlf_tpu.config import Config
    from mmlf_tpu.data import transforms as T
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.models.ensemble import ensemble_forward, ensemble_grid
    from mmlf_tpu.ops.masks import create_mask_margin
    from mmlf_tpu.validate.cli import load_model_state

    variables, kwargs = load_model_state(args.ckpt)
    kwargs['train_shift'] = args.train_shift
    cfg = Config.from_dict(kwargs)
    model = FeedForward.from_config(cfg)
    apply_fn = lambda v, *s: model.apply(v, *s)

    valset = HCI4D(args.dataset, transform=T.Shift(args.train_shift))
    shifts = ensemble_grid(cfg.val_disp_min, cfg.val_disp_max,
                           cfg.val_disp_step)
    K = len(shifts)

    ens = jax.jit(lambda v, h, vv, i, d: ensemble_forward(
        apply_fn, v, h, vv, i, d, cfg.val_disp_min, cfg.val_disp_max,
        cfg.val_disp_step))
    bare = jax.jit(apply_fn)

    mses = {'bare': [], 'ese': [], 'oracle': []}
    corr_all, cover = [], {}
    for j in range(min(args.scenes, len(valset.scenes))):
        h, v, i, d, center, gt, mpi, mask, index = valset[j]
        stacks = [jnp.asarray(x[None]) for x in (h, v, i, d)]
        m = (np.asarray(create_mask_margin(gt.shape, 15)) > 0) & \
            (np.asarray(mask) > 0)

        out_b = bare(variables, *stacks)
        out_e = ens(variables, *stacks)
        means = np.asarray(out_e['means'])[:, 0]     # (K, H, W)
        logvars = np.asarray(out_e['logvars'])[:, 0]
        errs = np.abs(means - gt[None])

        mse = lambda pred: float(((pred - gt) ** 2)[m].mean())
        mses['bare'].append(mse(np.asarray(out_b['mean'])[0]))
        mses['ese'].append(mse(np.asarray(out_e['mean'])[0]))
        oracle = np.take_along_axis(means, errs.argmin(0)[None], 0)[0]
        mses['oracle'].append(mse(oracle))

        corr = rankcorr(logvars, errs)[m]
        corr_all.append(float(corr.mean()))

        # coverage: bucket by the disparity the trunk actually sees,
        # gt + shift_k (the member re-centers gt by -shift_k... the trunk
        # input disparity is gt - (-shift_k) = gt + shift_k)
        eff = gt[None] + shifts[:, None, None]
        for lo in range(-4, 4):
            sel = (eff >= lo) & (eff < lo + 1) & m[None]
            if sel.sum() > 100:
                cover.setdefault(lo, []).append(
                    (float(logvars[sel].mean()), float(errs[sel].mean())))

    print('=== ESE selection quality (masked MSE, mean over '
          f'{len(mses["bare"])} scenes) ===')
    for k in ('bare', 'ese', 'oracle'):
        print(f'  {k:>7}: {np.mean(mses[k]):.5f}')
    print(f'=== logvar/|err| member rank correlation: '
          f'{np.mean(corr_all):+.3f} (1.0 = perfectly calibrated) ===')
    print('=== coverage: trunk-input disparity bucket -> '
          '(mean logvar, mean |err|) ===')
    for lo in sorted(cover):
        lv, er = np.mean(cover[lo], axis=0)
        print(f'  [{lo:+d},{lo + 1:+d}): logvar {lv:+.3f}  |err| {er:.3f}')

    if args.no_torch:
        return

    # reference cross-check on a crop with the same trained weights
    import torch
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.feed_forward import FeedForward as TorchFF
    from mmlf.model.ensamble import Ensamble as TorchEns
    from mmlf_tpu.utils.convert import flax_to_torch_state

    torch.set_num_threads(1)
    tmodel = TorchFF(**cfg.to_dict())
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
          else torch.tensor(v)
          for k, v in flax_to_torch_state(
              variables, in_blocks=cfg.model_in_blocks,
              out_blocks=cfg.model_out_blocks,
              cross=cfg.model_cross).items()}
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()
    tens = TorchEns(tmodel, cfg.val_disp_min, cfg.val_disp_max,
                    cfg.val_disp_step)

    h, v, i, d, center, gt, mpi, mask, index = valset[0]
    c = args.crop
    crop = [x[:, :c, :c] for x in (h, v, i, d)]
    stacks = [jnp.asarray(x[None]) for x in crop]
    out_j = ens(variables, *stacks)
    with torch.no_grad():
        out_t = tens(*[torch.from_numpy(
            np.ascontiguousarray(np.transpose(x[None], (0, 1, 4, 2, 3))))
            for x in crop])

    dm = np.abs(np.asarray(out_j['means']) - out_t['means'].numpy()).max()
    dl = np.abs(np.asarray(out_j['logvars'])
                - out_t['logvars'].numpy()).max()
    sel_j = np.asarray(out_j['logvars'])[:, 0].argmin(0)
    sel_t = out_t['logvars'].numpy()[:, 0].argmin(0)
    agree = float((sel_j == sel_t).mean())
    dsel = np.abs(np.asarray(out_j['mean'])[0]
                  - out_t['mean'].numpy()[0]).max()
    print(f'=== reference torch Ensamble cross-check ({c}x{c} crop, '
          f'{K} members, trained weights) ===')
    print(f'  max |means diff|   {dm:.2e}')
    print(f'  max |logvars diff| {dl:.2e}')
    print(f'  selection agreement {agree * 100:.2f}%  '
          f'(disagreements are argmin ties within float noise)')
    print(f'  max |selected mean diff| {dsel:.2e}')


if __name__ == '__main__':
    main()
