"""Measure the fused Pallas canvas trunk against the XLA trunk on the
real chip: full train step (gather+augment+fwd+bwd+Adam), bench recipe.

Each configuration runs in its OWN subprocess: a first in-process sweep
showed that after one RESOURCE_EXHAUSTED the TPU client keeps every
subsequent compile failing, so one bad config poisoned the whole sweep.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pallas_trunk_bench.py
"""
import os
import subprocess
import sys

sys.path.insert(0, '/root/repo')

CONFIGS = [
    # (chs, bs, pallas, accum, measure)
    (70, 128, False, 0, 10),
    (70, 128, True, 0, 10),
    (64, 128, False, 0, 10),
    (64, 128, True, 0, 10),
    # the README bs=512 recipe (VERDICT r2 item 2: target <= ~1000 ms/step)
    (70, 512, False, 4, 5),
    (70, 512, True, 4, 5),
    (70, 512, False, 8, 5),
    (70, 512, True, 8, 5),
]


def run_one(chs, bs, pallas, accum, measure):
    from bench import measure as bench_measure
    import jax
    print(f'device: {jax.devices()[0]}', flush=True)
    label = f'chs={chs} bs={bs} pallas={pallas}' + (
        f' accum={accum}' if accum else '')
    cfg = {'model_chs': chs, 'pallas_trunk': pallas}
    if accum:
        cfg['train_accum'] = accum
    try:
        bench_measure(cfg, bs, measure=measure, label=label)
    except Exception as e:
        print(f'[{label}] FAILED: {str(e)[:400]}', flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--one':
        chs, bs, pallas, accum, measure = (int(v) for v in sys.argv[2:7])
        run_one(chs, bs, bool(pallas), accum, measure)
        return
    env = dict(os.environ)
    env['PYTHONPATH'] = '/root/repo:' + env.get('PYTHONPATH', '')
    for chs, bs, pallas, accum, measure in CONFIGS:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--one',
             str(chs), str(bs), str(int(pallas)), str(accum), str(measure)],
            env=env, timeout=1200)


if __name__ == '__main__':
    main()
