"""Collect the parity-run validate logs into the reference's table format.

Reads ``$PARITY_ROOT/val_*.log`` (written by scripts/parity_runs.sh), pulls
each run's LaTeX metric row + NLL (the validate CLI's final output,
reference mmlf/validate/cli.py:350-352), and prints a markdown table with
MSE reported ×100 like the paper's convention.

Usage: python scripts/parity_table.py [/tmp/parity]
"""

import os
import re
import sys


def parse_log(path):
    txt = open(path).read()
    rows = re.findall(
        r'^([\d.]+) & ([\d.]+) & ([\d.]+) & ([\d.]+) & ([\d.]+) & - & '
        r'([\d.]+) \\\\$', txt, re.M)
    nlls = re.findall(r'^NLL:\s+([\d.eE+-]+)', txt, re.M)
    if not rows or not nlls:
        return None
    mse, badpix, kld_um, kld_mm, kld, t = map(float, rows[-1])
    return dict(mse=mse, badpix=badpix, kld_um=kld_um, kld_mm=kld_mm,
                kld=kld, time=t, nll=float(nlls[-1]))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/parity'
    names = [('BASE', 'base'), ('UPR', 'upr'), ('ESE', 'ese'),
             ('DPP', 'dpp'),
             # TPU-recipe width (model_chs=64, scripts/chs64_parity_run.sh)
             ('UPR-64', 'upr64'), ('ESE-64', 'ese64')]
    print('| head | MSE ×100 | BadPix(0.07) | KLD | KLD_MM | KLD_UM | '
          'NLL | s/scene |')
    print('|---|---|---|---|---|---|---|---|')
    # round-5 measurement arms (anchor A/Bs, regression re-proof, INN):
    # rows appear whenever their validate logs exist in $PARITY_ROOT
    extras = sorted(
        f for f in os.listdir(root) if f.startswith('val_')
        and f.endswith('.log')
        and f[4:-4] not in {n for _, n in names}) if os.path.isdir(root) \
        else []
    names = names + [(f[4:-4], f[4:-4]) for f in extras]

    for label, name in names:
        path = os.path.join(root, f'val_{name}.log')
        m = parse_log(path) if os.path.exists(path) else None
        if m is None:
            print(f'| {label} | — | — | — | — | — | — | — |')
            continue
        print(f'| {label} | {m["mse"] * 100:.2f} | {m["badpix"]:.3f} | '
              f'{m["kld"]:.3f} | {m["kld_mm"]:.3f} | {m["kld_um"]:.3f} | '
              f'{m["nll"]:.3f} | {m["time"]:.2f} |')


if __name__ == '__main__':
    main()
