"""Dataset + transform tests on synthetic scenes."""

import os

import numpy as np
import pytest

from mmlf_tpu.data import HCI4D
from mmlf_tpu.data import transforms as T
from mmlf_tpu.data.synth import generate_dataset


@pytest.fixture(scope='module')
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synth'))
    generate_dataset(root, scenes=2, size=64, seed=0)
    return root


def test_loader_shapes(dataset_dir):
    ds = HCI4D(dataset_dir)
    assert len(ds) == 2
    h, v, i, d, center, gt, mpi, mask, index = ds[0]
    assert h.shape == (9, 64, 64, 3) and h.dtype == np.float32
    assert v.shape == i.shape == d.shape == h.shape
    assert center.shape == (64, 64, 3)
    assert gt.shape == (64, 64)
    assert mpi.shape[1:] == (64, 64, 5) and mpi.shape[0] == 2
    assert mask.shape == (64, 64)
    assert index[0] == 0


def test_load_scene_threads_and_raw_views(dataset_dir):
    """Threaded decode and u8 raw-view loading are exact: threads only
    parallelize, raw uint8 stacks are the pre-normalization bytes."""
    import os
    from mmlf_tpu.data.hci4d import load_scene
    scene = os.path.join(dataset_dir, sorted(os.listdir(dataset_dir))[0])

    serial = load_scene(scene)
    threaded = load_scene(scene, threads=4)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)

    raw = load_scene(scene, raw_views=True, threads=4)
    assert raw[0].dtype == np.uint8
    for j in range(4):
        np.testing.assert_allclose(raw[j].astype(np.float32) / 255.0,
                                   serial[j], atol=1e-7)
    np.testing.assert_allclose(raw[4], serial[4], atol=1e-7)  # center
    np.testing.assert_array_equal(raw[5], serial[5])          # gt


def test_center_is_center_view(dataset_dir):
    ds = HCI4D(dataset_dir)
    h, v, i, d, center, *_ = ds[0]
    np.testing.assert_array_equal(center, v[4])
    np.testing.assert_array_equal(h[4], v[4])   # cross shares the center
    np.testing.assert_array_equal(i[4], d[4])


def test_virtual_length_and_cache(dataset_dir):
    ds = HCI4D(dataset_dir, cache=True, length=16)
    assert len(ds) == 16
    a = ds[1]
    b = ds[3]   # 3 % 2 == 1 → same scene
    np.testing.assert_array_equal(a[0], b[0])


def test_shift_aligns_synthetic_views(dataset_dir):
    """EPI-Shift by the background disparity must align background pixels of
    every view with the center view (the physical consistency check)."""
    ds = HCI4D(dataset_dir)
    h, v, i, d, center, gt, mpi, mask, _ = ds[0]
    disp_bg = float(mpi[0, 0, 0, 4])

    shifted = T.Shift(disp_bg)((h, v, i, d, center, gt.copy(), mpi.copy(),
                                mask, None))
    sh, sv, si, sd, _, sgt, smpi, *_ = shifted
    # gt corrected
    np.testing.assert_allclose(sgt, gt - disp_bg, atol=1e-6)
    np.testing.assert_allclose(smpi[..., 4], mpi[..., 4] - disp_bg,
                               atol=1e-6)

    # background-only pixels align across all views (guard band for wraps
    # and for foreground parallax reach)
    bg = (gt == disp_bg)
    # max parallax of either plane at the outermost views, + lerp blur margin
    reach = int(np.ceil(abs(disp_bg) * 4 + abs(float(mpi[1, ..., 4].max()))
                        * 4)) + 4
    interior = np.zeros_like(bg)
    interior[reach:-reach, reach:-reach] = True
    # stay away from the foreground box (diagonal stacks shift in both axes,
    # so erode with a square footprint)
    from scipy.ndimage import binary_erosion
    footprint = np.ones((2 * reach + 1, 2 * reach + 1), bool)
    safe = binary_erosion(bg, structure=footprint) & interior
    assert safe.sum() > 100
    # fractional disparities blur twice (render lerp + inverse-shift lerp),
    # so alignment is near-exact, not exact
    for stack in (sh, sv, si, sd):
        for k in range(9):
            diff = np.abs(stack[k] - center)[safe]
            assert diff.max() < 0.1, f'view {k} misaligned: {diff.max()}'
            assert diff.mean() < 0.02, f"view {k} mean err: {diff.mean()}"


def test_rotate90_consistency(dataset_dir):
    ds = HCI4D(dataset_dir)
    data = ds[0]
    rot = T.Rotate90()(data)
    h, v, i, d, center, gt, mpi, mask, _ = rot
    # 4 rotations = identity for rotated fields
    out = data
    for _ in range(4):
        out = T.Rotate90()(out)
    np.testing.assert_allclose(out[0], data[0], atol=1e-6)
    np.testing.assert_allclose(out[4], data[4], atol=1e-6)
    np.testing.assert_allclose(out[5], data[5], atol=1e-6)
    np.testing.assert_allclose(out[6], data[6], atol=1e-6)
    # mask untouched by a single rotation (reference quirk)
    np.testing.assert_array_equal(rot[7], data[7])
    # new horizontal stack is the old vertical
    np.testing.assert_allclose(h, T.rot90_field(data[1], -3), atol=1e-6)


def test_downsampling_scales_disparity(dataset_dir):
    ds = HCI4D(dataset_dir)
    data = ds[0]
    out = T.DownSampling(2)(data)
    assert out[0].shape == (9, 32, 32, 3)
    assert out[7].shape == (32, 32)
    np.testing.assert_allclose(out[5], data[5][::2, ::2] / 2.0)
    np.testing.assert_allclose(out[6][..., 4], data[6][:, ::2, ::2, 4] / 2.0)


def test_crop_chain(dataset_dir):
    ds = HCI4D(dataset_dir)
    out = T.Compose([T.RandomCrop(48), T.CenterCrop(32)])(ds[0])
    assert out[0].shape == (9, 32, 32, 3)
    assert out[5].shape == (32, 32)
    assert out[6].shape[1:3] == (32, 32)


def test_color_transforms_preserve_gray(dataset_dir):
    """The redistribution matrix rows sum to 1, so gray stays gray."""
    mat = T.random_color_matrix()
    np.testing.assert_allclose(mat.sum(1), 1.0, atol=1e-6)
    gray = np.full((2, 4, 4, 3), 0.5, np.float32)
    np.testing.assert_allclose(T.apply_color_matrix(gray, mat), gray,
                               atol=1e-6)


def test_save_batch_layout(dataset_dir, tmp_path):
    ds = HCI4D(dataset_dir)
    out_dir = str(tmp_path / 'out')
    os.makedirs(out_dir)
    result = np.zeros((1, 64, 64), np.float32)
    uncert = np.ones((1, 64, 64), np.float32)
    posterior = np.zeros((1, 108, 64, 64), np.float32)
    ds.save_batch(out_dir, np.array([[0]]), result, uncert, runtime=1.0,
                  posterior=posterior)
    scene = ds.scenes_names[0]
    sdir = os.path.join(out_dir, 'scenes', scene)
    for f in ('center.png', 'gt.png', 'gt.pfm', 'result.pfm', 'result.png',
              'uncert.pfm', 'uncert.png', 'diff.png', 'posterior.npy',
              'view_h_0.png', 'view_d_8.png'):
        assert os.path.exists(os.path.join(sdir, f)), f
    assert os.path.exists(os.path.join(out_dir, 'ours', 'disp_maps',
                                       f'{scene}.pfm'))
    rt = os.path.join(out_dir, 'ours', 'runtimes', f'{scene}.txt')
    assert float(open(rt).read()) == 1.0

    # gt.pfm round-trips through the flip convention
    from mmlf_tpu.utils import pfm
    gt_file = pfm.load(os.path.join(sdir, 'gt.pfm'))
    np.testing.assert_allclose(np.flip(gt_file, 0), ds[0][5], atol=1e-6)


def test_synth_multilayer_depth_order():
    """Occlusion must follow parallax and MPI alphas must be COMPOSITING
    weights: planes sorted far->near, background farthest, per-pixel alpha
    sums exactly 1 (occupancy alphas made the unbounded reference
    multimodal CE diverge — code-review + DPP-divergence r2 findings), GT
    is the dominant-weight plane, and feathered edges carry genuinely
    multimodal pixels."""
    from mmlf_tpu.data.synth import make_scene

    rng = np.random.default_rng(7)
    # extras deliberately include one behind the background (must be
    # dropped) and one between bg and fg (must composite before fg)
    views, gt, mpi, _ = make_scene(rng, size=64, disp_bg=-1.0, disp_fg=1.5,
                                   extra_disps=(-2.0, 0.3))
    disps = mpi[:, 0, 0, 4]
    assert disps[0] == -1.0                        # bg first
    assert np.all(np.diff(disps) > 0)              # ascending = far->near
    assert -2.0 not in disps                       # hidden layer dropped

    alpha = mpi[..., 3]
    np.testing.assert_allclose(alpha.sum(0), 1.0, atol=1e-5)
    assert alpha.min() >= 0.0

    # GT is the dominant plane everywhere
    np.testing.assert_allclose(gt, disps[alpha.argmax(0)])

    # feathered edges leave multimodal pixels (two planes sharing weight)
    assert ((alpha > 0.3).sum(0) > 1).sum() > 10


def test_save_views(tmp_path):
    """utils/lf.py view dump: one PNG per view per stack, values preserved
    (reference: mmlf/utils/lf.py save_views)."""
    from mmlf_tpu.utils.lf import save_views
    from mmlf_tpu.utils.imgio import load_img

    rng = np.random.default_rng(3)
    stacks = [rng.random((5, 16, 16, 3), dtype=np.float32)
              for _ in range(4)]
    scene = str(tmp_path / 'scene')
    # a leading batch dim must be stripped
    save_views(scene, stacks[0][None], stacks[1], stacks[2], stacks[3])

    for tag, stack in zip('hvid', stacks):
        for j in range(5):
            p = os.path.join(scene, f'view_{tag}_{j}.png')
            assert os.path.exists(p), p
        back = load_img(os.path.join(scene, f'view_{tag}_2.png'))
        np.testing.assert_allclose(back, stack[2], atol=1 / 255)

    # optional diagonal stacks may be omitted
    save_views(str(tmp_path / 's2'), stacks[0], stacks[1])
    assert not os.path.exists(str(tmp_path / 's2' / 'view_i_0.png'))
