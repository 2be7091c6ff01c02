"""End-to-end smoke tests of the analysis CLIs on fabricated artifacts."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from mmlf_tpu.utils import pfm
from mmlf_tpu.utils.imgio import save_img


@pytest.fixture(scope='module')
def artifacts(tmp_path_factory):
    """A minimal validate-CLI output tree with one scene."""
    rng = np.random.default_rng(0)
    out = tmp_path_factory.mktemp('artifacts')
    scene = out / 'scenes' / 'toy'
    scene.mkdir(parents=True)

    h = w = 48
    gt = rng.normal(0, 1, (h, w)).astype(np.float32)
    result = gt + rng.normal(0, 0.1, (h, w)).astype(np.float32)
    uncert = np.abs(result - gt) + 0.01 * rng.random((h, w),
                                                     dtype=np.float32)

    pfm.save(str(scene / 'gt.pfm'), np.flip(gt, 0).copy())
    pfm.save(str(scene / 'result.pfm'), np.flip(result, 0).copy())
    pfm.save(str(scene / 'uncert.pfm'), np.flip(uncert, 0).copy())
    save_img(str(scene / 'center.png'),
             rng.random((h, w, 3), dtype=np.float32))

    # bimodal-ish posterior
    post = rng.random((108, h, w), dtype=np.float32) * 0.05
    idx = np.clip(((gt + 3.5) / 7.0 * 107).astype(int), 0, 107)
    for y in range(h):
        for x in range(w):
            post[idx[y, x], y, x] = 1.0
    np.save(str(scene / 'posterior.npy'), post)

    gmm = np.stack([rng.normal(0, 1, (4, h, w)),
                    rng.uniform(0.1, 0.5, (4, h, w))]).astype(np.float32)
    np.save(str(scene / 'gmm.npy'), gmm)
    return out, scene, gt


def test_sparsify_cli(artifacts):
    from mmlf_tpu.validate.sparsify import main
    out, scene, gt = artifacts
    r = CliRunner().invoke(main, [str(out), '--step', '0.1'])
    assert r.exit_code == 0, r.output
    assert 'AUC' in r.output
    assert os.path.exists(out / 'sparsify.csv')
    lines = open(out / 'sparsify.csv').read().splitlines()
    assert lines[0].startswith('frac')
    assert len(lines) == 11   # header + 10 fractions (last dropped)


def test_cluster_then_multimodal_and_mm_prediction(artifacts, monkeypatch,
                                                   tmp_path):
    from mmlf_tpu.validate.cluster import main as cluster_main
    from mmlf_tpu.validate.multimodal import main as mm_main
    from mmlf_tpu.utils.modecnt import main as modecnt_main
    from mmlf_tpu.validate.mm_prediction import main as mmp_main
    out, scene, gt = artifacts

    monkeypatch.chdir(tmp_path)   # CLIs drop debug PNGs into cwd

    r = CliRunner().invoke(cluster_main, [str(out)])
    assert r.exit_code == 0, r.output
    assert os.path.exists(scene / 'gt_modes.npy')
    modes = np.load(scene / 'gt_modes.npy')
    assert modes.shape == (48, 48, 2)

    r = CliRunner().invoke(modecnt_main, [str(out)])
    assert r.exit_code == 0, r.output
    assert os.path.exists(scene / 'mode_prop.pfm')

    r = CliRunner().invoke(mm_main, [str(out)])
    assert r.exit_code == 0, r.output
    assert 'MSE:' in r.output and 'BadPix:' in r.output

    r = CliRunner().invoke(mmp_main, [str(out), '--step', '0.2'])
    assert r.exit_code == 0, r.output
    assert os.path.exists(out / 'mm_pred.csv')


def test_gmm_cnt_cli(artifacts):
    from mmlf_tpu.utils.gmm_cnt import main
    out, scene, gt = artifacts
    r = CliRunner().invoke(main, [str(scene), str(scene), '--step', '0.05'])
    assert r.exit_code == 0, r.output
    assert os.path.exists(scene / 'second_chance.txt')
    txt = open(scene / 'second_chance.txt').read()
    assert 'MSE:' in txt and 'BadPix:' in txt


def test_csv_exporters(artifacts, tmp_path):
    from mmlf_tpu.utils.gmm2csv import main as gmm2csv
    from mmlf_tpu.utils.gmm2csv2 import main as gmm2csv2
    from mmlf_tpu.utils.post2csv import main as post2csv
    from mmlf_tpu.utils.nll2csv import main as nll2csv
    from mmlf_tpu.utils.uncert2csv import main as uncert2csv
    out, scene, gt = artifacts

    o = tmp_path / 'c.csv'
    r = CliRunner().invoke(gmm2csv, [str(scene / 'gmm.npy'), str(o),
                                     '5', '6', '--sum_only'])
    assert r.exit_code == 0, r.output
    assert open(o).readline().startswith('x,')

    r = CliRunner().invoke(gmm2csv2, [str(tmp_path / 'demo.csv')])
    assert r.exit_code == 0, r.output

    r = CliRunner().invoke(post2csv, [str(scene), '5', '6'])
    assert r.exit_code == 0, r.output
    assert os.path.exists(scene / 'posterior_5_6.csv')

    np.save(str(tmp_path / 'nll.npy'),
            np.random.rand(108, 48, 48).astype(np.float32))
    r = CliRunner().invoke(nll2csv, [str(tmp_path / 'nll.npy'),
                                     str(tmp_path / 'n.csv'), '5', '6'])
    assert r.exit_code == 0, r.output

    r = CliRunner().invoke(uncert2csv, [str(scene / 'result.pfm'),
                                        str(scene / 'uncert.pfm'),
                                        str(tmp_path / 'u.csv'), '5', '6'])
    assert r.exit_code == 0, r.output


def test_pixel_likelihood_rows():
    """nll2csv core: [start, stop) bin grid + likelihood = exp(-nll),
    with and without the leading batch axis."""
    from mmlf_tpu.utils.nll2csv import pixel_likelihood_rows

    nll = np.random.rand(108, 8, 8).astype(np.float32) * 5
    disp, lh = pixel_likelihood_rows(nll, x=3, y=2, start=-3.5, stop=3.5)
    assert disp.shape == lh.shape == (108,)
    # half-open grid: first bin at start, stop never reached
    assert disp[0] == -3.5 and disp[-1] < 3.5
    np.testing.assert_allclose(np.diff(disp), 7.0 / 108, rtol=1e-12)
    np.testing.assert_array_equal(lh, np.exp(-nll[:, 2, 3]))
    # likelihood text must render as float32 (reference CSV parity)
    assert lh.dtype == np.float32
    # 4-D input uses the first batch element
    disp4, lh4 = pixel_likelihood_rows(nll[None], x=3, y=2,
                                       start=-3.5, stop=3.5)
    np.testing.assert_array_equal(disp, disp4)
    np.testing.assert_array_equal(lh, lh4)


def test_edges_cli(tmp_path):
    from mmlf_tpu.validate.edges import main
    scene = tmp_path / 'ds' / 's0'
    scene.mkdir(parents=True)
    gt = np.zeros((32, 32), np.float32)
    gt[:, 16:] = 2.0
    pfm.save(str(scene / 'gt_disp_lowres.pfm'), np.flip(gt, 0).copy())
    r = CliRunner().invoke(main, [str(tmp_path / 'ds')])
    assert r.exit_code == 0, r.output
    assert os.path.exists(scene / 'edges.png')

def test_plot_renderer(artifacts, tmp_path):
    """The TeX-free figure renderer (visualize/plot.py) draws both CSV
    kinds the pgfplots builds consume: sparsify.csv (3 series, legend,
    dashed sparsification error) and a distribution-curve CSV."""
    from mmlf_tpu.validate.sparsify import main as sparsify
    from mmlf_tpu.utils.post2csv import main as post2csv
    from mmlf_tpu.visualize.plot import main as plot, read_csv
    out, scene, gt = artifacts

    r = CliRunner().invoke(sparsify, [str(out), '--step', '0.1'])
    assert r.exit_code == 0, r.output
    png = tmp_path / 'sparsify.png'
    r = CliRunner().invoke(plot, [str(out / 'sparsify.csv'), str(png)])
    assert r.exit_code == 0, r.output
    assert png.stat().st_size > 4000            # a real rendered figure

    r = CliRunner().invoke(post2csv, [str(scene), '5', '6'])
    assert r.exit_code == 0, r.output
    svg = tmp_path / 'curve.svg'
    r = CliRunner().invoke(plot, [str(scene / 'posterior_5_6.csv'),
                                  str(svg), '--title', 'pixel (5,6)'])
    assert r.exit_code == 0, r.output
    assert b'<svg' in svg.read_bytes()[:500]

    names, data = read_csv(str(out / 'sparsify.csv'))
    assert names == ['frac', 'oracle', 'uncert', 'sparse_err']
    assert data.shape[1] == 4


def test_plot_read_csv_degenerate_shapes(tmp_path):
    """ADVICE r3: a one-data-row CSV parses as one row (not N columns),
    and an x-only CSV is rejected with a clear message."""
    import click
    from mmlf_tpu.visualize.plot import read_csv

    p = tmp_path / 'row.csv'
    p.write_text('x, a, b\n1.0, 2.0, 3.0\n')
    names, data = read_csv(str(p))
    assert names == ['x', 'a', 'b'] and data.shape == (1, 3)

    p2 = tmp_path / 'xonly.csv'
    p2.write_text('x\n1.0\n2.0\n')
    with pytest.raises(click.ClickException, match='nothing to plot'):
        read_csv(str(p2))
