"""Dump one pixel's per-class likelihood (from saved NLL scores) to CSV.

``python -m mmlf_tpu.utils.nll2csv INPUT OUTPUT X Y [--start --stop]``
(reference: mmlf/utils/nll2csv.py).
"""

from __future__ import annotations

import sys

import click
import numpy as np


@click.command()
@click.argument('input', type=click.Path(exists=True))
@click.argument('output', type=click.Path())
@click.argument('x', type=int)
@click.argument('y', type=int)
@click.option('--start', default=-3.5, help='lower limit')
@click.option('--stop', default=3.5, help='upper limit')
def main(input, output, x, y, start, stop):
    nll = np.load(input)
    if nll.ndim == 4:
        nll = nll[0]
    nll = nll[:, y, x]
    lh = np.exp(-nll)

    # bin index -> disparity on the [start, stop) grid (no stop endpoint:
    # reference parity), one CSV row per class
    disp = np.arange(nll.shape[0]) / nll.shape[0] * (stop - start) + start
    with open(output, 'w') as f:
        f.write('disparity, likelihood\n')
        f.writelines(f'{d}, {l}\n' for d, l in zip(disp, lh))


if __name__ == '__main__':
    sys.exit(main())
