"""Cross-check a trained checkpoint against the reference torch model with
the SAME weights (flax→torch export) — the BASE/DPP closure of VERDICT r2
item 3 (UPR/ESE got this in round 2 via ese_diag.py).

Loads `checkpoint.msgpack` from CKPT_DIR, exports it with
`flax_to_torch_state`, loads the reference `FeedForward` strictly, and
compares eval-mode head outputs on crops of real dataset scenes at fp32.
A post-'tf'-fix checkpoint must agree to ~1e-4 on `mean` (and `scores`
for DPP); a pre-fix checkpoint diverges wildly on any scene with signal
in the diagonal streams.

Usage:
  python scripts/head_crosscheck.py CKPT_DIR DATASET [--train_shift 2.5]
      [--crop 96] [--scenes 2]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt')
    ap.add_argument('dataset')
    ap.add_argument('--train_shift', type=float, default=2.5)
    ap.add_argument('--crop', type=int, default=96)
    ap.add_argument('--scenes', type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import torch

    from mmlf_tpu.config import Config
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data import transforms as T
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.checkpoint import load_checkpoint_raw
    from mmlf_tpu.utils.convert import flax_to_torch_state

    restored, _, hyper = load_checkpoint_raw(args.ckpt)
    cfg = Config.from_dict(hyper).finalize()
    variables = {'params': restored['params'],
                 'batch_stats': restored.get('batch_stats', {})}
    model = FeedForward.from_config(
        Config.from_dict({**cfg.to_dict(), 'bf16': False}).finalize())

    sd = flax_to_torch_state(variables, in_blocks=cfg.model_in_blocks,
                             out_blocks=cfg.model_out_blocks,
                             no_batchnorm=cfg.model_no_batchnorm,
                             cross=cfg.model_cross)
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model.feed_forward import FeedForward as TorchFF
    tmodel = TorchFF(**cfg.to_dict())
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
         else torch.tensor(v) for k, v in sd.items()}, strict=True)
    tmodel.eval()

    ds = HCI4D(args.dataset, transform=T.Shift(args.train_shift))
    c = args.crop
    worst = {'mean': 0.0, 'scores': 0.0, 'logvar': 0.0}
    for i in range(min(args.scenes, len(ds.scenes))):
        h, v, ii, d, _, gt, _, _, _ = ds[i]
        stacks = [x[:, 100:100 + c, 100:100 + c].astype(np.float32)[None]
                  for x in (h, v, ii, d)]
        jout = model.apply(variables, *[jnp.asarray(s) for s in stacks])
        with torch.no_grad():
            tout = tmodel(*[torch.from_numpy(np.ascontiguousarray(
                np.transpose(s, (0, 1, 4, 2, 3)))) for s in stacks])
        for k in worst:
            jv = jout.get(k)
            tv = tout.get(k)
            if jv is None or tv is None:
                continue
            jv = np.asarray(jv)
            tv = tv.numpy()
            if k == 'scores':        # torch scores are NCHW
                tv = np.transpose(tv, (0, 2, 3, 1))
            m = 12                   # skip the border band (bf16-free here,
            #                          but edge effects are irrelevant)
            sl = (slice(None), slice(m, c - m), slice(m, c - m))
            dmax = float(np.abs(jv[sl] - tv[sl]).max())
            worst[k] = max(worst[k], dmax)
        print(f'scene {i}: ' + '  '.join(
            f'{k} dmax={worst[k]:.3e}' for k in worst if worst[k] > 0 or
            jout.get(k) is not None and tout.get(k) is not None))

    ok = all(vv < 5e-3 for vv in worst.values())
    print('CROSSCHECK', 'OK' if ok else 'FAIL', worst)
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
