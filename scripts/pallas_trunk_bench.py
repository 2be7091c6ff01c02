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


if __name__ == '__main__':
    main()
