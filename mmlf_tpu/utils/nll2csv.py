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
    scores = np.load(input)
    pixel_nll = (scores[0] if scores.ndim == 4 else scores)[:, y, x]
    n_bins = pixel_nll.shape[0]

    # bin index -> disparity on the [start, stop) grid (no stop endpoint:
    # reference parity), one CSV row per class
    disp = start + (stop - start) * np.arange(n_bins) / n_bins
    rows = np.column_stack([disp, np.exp(-pixel_nll)])
    with open(output, 'w') as f:
        f.write('disparity, likelihood\n')
        f.writelines(f'{d}, {l}\n' for d, l in rows)


if __name__ == '__main__':
    sys.exit(main())
