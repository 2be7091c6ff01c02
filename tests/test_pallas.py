"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mmlf_tpu.ops.pallas.posterior import (ensemble_posterior,
                                           laplace_mixture_posterior)


def _oracle(means, variances, bins):
    """Dense numpy mixture: (Kb, P)."""
    out = np.zeros((len(bins), means.shape[1]))
    for m, v in zip(means, variances):
        out += np.exp(-np.abs(bins[:, None] - m[None]) / v[None]) \
            / (2.0 * v[None])
    return out / means.shape[0]


def test_mixture_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    k, p, kb = 7, 300, 11        # p deliberately not a tile multiple
    means = rng.uniform(-3, 3, (k, p)).astype(np.float32)
    variances = rng.uniform(0.2, 2.0, (k, p)).astype(np.float32)
    bins = np.linspace(-3.5, 3.5, kb).astype(np.float32)

    got = np.asarray(laplace_mixture_posterior(
        jnp.asarray(means), jnp.asarray(variances), jnp.asarray(bins),
        interpret=True))
    want = _oracle(means, variances, bins)
    assert got.shape == (kb, p)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_ensemble_posterior_matches_scan_formulation():
    """The kernel must agree with the laplacian-accumulation the scan path
    uses (models/ensemble.py)."""
    from mmlf_tpu.models.feed_forward import laplacian
    from mmlf_tpu.ops.codecs import bin_centers

    rng = np.random.default_rng(1)
    k, b, h, w = 5, 1, 6, 8
    means = rng.uniform(-2, 2, (k, b, h, w)).astype(np.float32)
    logvars = rng.uniform(-1, 0.5, (k, b, h, w)).astype(np.float32)

    got = np.asarray(ensemble_posterior(
        jnp.asarray(means), jnp.asarray(logvars), -3.5, 3.5,
        interpret=True))

    bins = bin_centers(-3.5, 3.5, k)
    want = np.zeros((b, h, w, k), np.float32)
    for i in range(k):
        want += np.asarray(laplacian(bins, means[i], np.exp(logvars[i])))
    want /= k
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_fused_double_conv_fwd_and_grads():
    """Canvas-layout fused trunk block (ops/pallas/conv_block.py):
    forward AND every gradient (x, input affine, both convs) must match
    the XLA formulation of the same math, including the BN-stats outputs'
    cotangent paths (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from mmlf_tpu.ops.pallas.conv_block import (canvas_dims, from_canvas,
                                                fused_double_conv,
                                                interior_mask, to_canvas)

    rng = np.random.default_rng(3)
    b, h, w, cin, cout = 2, 13, 17, 24, 8
    s, p, mc, m = canvas_dims(h, w)

    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    si = jnp.asarray(np.abs(rng.standard_normal(cin)) + 0.5, jnp.float32)
    ti = jnp.asarray(rng.standard_normal(cin) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((2, 2, cin, cout))
                     / np.sqrt(4 * cin), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((2, 2, cout, cout))
                     / np.sqrt(4 * cout), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)

    def xla_ref(x, si, ti, w1, b1, w2, b2):
        z = jax.nn.relu(x * si + ti)
        y = jax.lax.conv_general_dilated(
            z, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b1
        y = jax.nn.relu(y)
        y2 = jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2
        ps = jnp.sum(y2, axis=(0, 1, 2))
        pss = jnp.sum(y2 * y2, axis=(0, 1, 2))
        return y2, ps, pss

    def pallas_fn(x, si, ti, w1, b1, w2, b2):
        xc = to_canvas(x, m)
        y2c, ps, pss = fused_double_conv(xc, si, ti, w1, b1, w2, b2,
                                         h, w, True, True, True)
        return from_canvas(y2c, h, w), ps, pss

    # forward
    ref = xla_ref(x, si, ti, w1, b1, w2, b2)
    got = pallas_fn(x, si, ti, w1, b1, w2, b2)
    for r, g, name in zip(ref, got, ('y2', 'ps', 'pss')):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=name)

    # gradients through a scalar mixing ALL outputs (exercises the y2,
    # ps AND pss cotangent paths)
    cw = jnp.asarray(rng.standard_normal((b, h, w, cout)), jnp.float32)

    def loss(fn):
        def f(*args):
            y2, ps, pss = fn(*args)
            return (jnp.sum(y2 * cw) + 0.3 * jnp.sum(ps * ps)
                    + 0.1 * jnp.sum(pss))
        return f

    args = (x, si, ti, w1, b1, w2, b2)
    g_ref = jax.grad(loss(xla_ref), argnums=tuple(range(7)))(*args)
    g_got = jax.grad(loss(pallas_fn), argnums=tuple(range(7)))(*args)
    names = ('dx', 'dsi', 'dti', 'dw1', 'db1', 'dw2', 'db2')
    for r, g, name in zip(g_ref, g_got, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_fused_double_conv_no_affine_entry():
    """Chain-entry variant: relu_in=False, affine_in=False."""
    import jax
    import jax.numpy as jnp
    from mmlf_tpu.ops.pallas.conv_block import (canvas_dims, from_canvas,
                                                fused_double_conv,
                                                to_canvas)

    rng = np.random.default_rng(5)
    b, h, w, cin, cout = 1, 9, 11, 40, 16
    _, _, _, m = canvas_dims(h, w)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.2,
                     jnp.float32)
    b1 = jnp.zeros(cout)
    w2 = jnp.asarray(rng.standard_normal((2, 2, cout, cout)) * 0.2,
                     jnp.float32)
    b2 = jnp.zeros(cout)
    ones = jnp.ones(cin)
    zeros = jnp.zeros(cin)

    y2c, _, _ = fused_double_conv(to_canvas(x, m), ones, zeros,
                                  w1, b1, w2, b2, h, w, False, False, True)
    got = from_canvas(y2c, h, w)

    y = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b1)
    want = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_outnet_matches_xla_outnet():
    """FeedForward(pallas_trunk=True): identical variable tree, and
    train-mode forward + gradients + BN stat updates match the XLA OutNet
    (fp32, interpret mode)."""
    import jax
    import jax.numpy as jnp
    from mmlf_tpu.config import Config
    from mmlf_tpu.models import FeedForward

    cfg = dict(model_chs=6, model_views=3, model_in_blocks=1,
               model_out_blocks=3, model_uncert=True)
    ref = FeedForward.from_config(Config(**cfg).finalize())
    pal = FeedForward.from_config(
        Config(pallas_trunk=True, **cfg).finalize())

    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((2, 3, 24, 28, 3), dtype=np.float32))
              for _ in range(4)]
    variables = ref.init(jax.random.PRNGKey(1), *stacks)
    v2 = pal.init(jax.random.PRNGKey(1), *stacks)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)

    def run(model):
        def loss(params, stats, h, v, i, d):
            out, mut = model.apply(
                {'params': params, 'batch_stats': stats}, h, v, i, d,
                train=True, mutable=['batch_stats'])
            return (jnp.mean(jnp.abs(out['mean']))
                    + 0.1 * jnp.mean(out['logvar'])), mut['batch_stats']
        (l, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
            variables['params'], variables['batch_stats'], *stacks)
        return l, new_stats, grads

    l_ref, st_ref, g_ref = run(ref)
    l_pal, st_pal, g_pal = run(pal)

    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_ref),
            jax.tree_util.tree_leaves_with_path(st_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f'stats {kp}')
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f'grad {kp}')
