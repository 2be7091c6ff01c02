"""Edge maps: Sobel-magnitude threshold PNG per dataset scene.

``python -m mmlf_tpu.validate.edges DATASET``
(reference: mmlf/validate/edges.py).
"""

from __future__ import annotations

import os
import sys

import click
import numpy as np
from scipy.ndimage import sobel

from ..utils import pfm
from ..utils.imgio import save_img


@click.command()
@click.argument('dataset', type=click.Path(exists=True))
def main(dataset):
    scenes = sorted(f.path for f in os.scandir(dataset) if f.is_dir())
    for scene in scenes:
        gt = np.flip(pfm.load(
            os.path.join(scene, 'gt_disp_lowres.pfm')), 0)
        der = np.sqrt(sobel(gt, 0) ** 2.0 + sobel(gt, 1) ** 2.0)
        save_img(os.path.join(scene, 'edges.png'),
                 (der > 0.5).astype(np.float32))


if __name__ == '__main__':
    sys.exit(main())
