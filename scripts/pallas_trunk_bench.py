"""Measure the fused Pallas canvas trunk against the XLA trunk on the
real chip: full train step (gather+augment+fwd+bwd+Adam), bench recipe.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pallas_trunk_bench.py
"""
import sys

sys.path.insert(0, '/root/repo')

from bench import measure  # noqa: E402


def main():
    import jax
    print(f'device: {jax.devices()[0]}', flush=True)
    for chs, bs in ((70, 128), (64, 128)):
        for pallas in (False, True):
            label = f'chs={chs} bs={bs} pallas={pallas}'
            try:
                measure({'model_chs': chs, 'pallas_trunk': pallas}, bs,
                        measure=10, label=label)
            except Exception as e:
                print(f'[{label}] FAILED: {str(e)[:400]}', flush=True)

    # the README bs=512 recipe (VERDICT r2 item 2: target <= ~1000 ms/step)
    # as grad accumulation; accum=4 uses the measured bs=128 per-patch
    # sweet spot, accum=8 mirrors the reference's 64/GPU split
    for accum in (4, 8):
        for pallas in (False, True):
            label = f'chs=70 bs=512 accum={accum} pallas={pallas}'
            try:
                measure({'model_chs': 70, 'pallas_trunk': pallas,
                         'train_accum': accum}, 512, measure=5,
                        label=label)
            except Exception as e:
                print(f'[{label}] FAILED: {str(e)[:400]}', flush=True)


if __name__ == '__main__':
    main()
