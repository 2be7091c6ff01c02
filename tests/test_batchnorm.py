"""FusedBatchNorm canonical-VJP backward (ops/batchnorm.py): gradient and
stats equivalence against flax nn.BatchNorm's plain-AD path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from mmlf_tpu.ops.batchnorm import FusedBatchNorm


def _setup(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(1.5, 2.0, (4, 8, 8, 6)), dtype)
    ours = FusedBatchNorm(momentum=0.9)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_bias=True,
                       use_scale=True, dtype=jnp.float32)
    v_ours = ours.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v_ref = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # non-trivial affine so dgamma/dbeta paths are exercised
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (6,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1.0, 1.0, (6,)), jnp.float32)
    v_ours = {'params': {'scale': scale, 'bias': bias},
              'batch_stats': v_ours['batch_stats']}
    v_ref = {'params': {'scale': scale, 'bias': bias},
             'batch_stats': v_ref['batch_stats']}
    return x, ours, ref, v_ours, v_ref


def test_forward_and_stats_match_flax():
    x, ours, ref, v_ours, v_ref = _setup()
    y1, m1 = ours.apply(v_ours, x, use_running_average=False,
                        mutable=['batch_stats'])
    y2, m2 = ref.apply(v_ref, x, use_running_average=False,
                       mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(m1['batch_stats'][k]),
            np.asarray(m2['batch_stats'][k]), rtol=1e-5)


def test_backward_matches_plain_ad():
    """The canonical two-reduction VJP must equal flax's autodiff gradient
    for x, scale, and bias — including the gradient THROUGH the batch
    statistics (the part the custom backward folds into dx)."""
    x, ours, ref, v_ours, v_ref = _setup()

    def loss(module, variables, x):
        # non-symmetric functional so mean/var gradient paths are live
        y, _ = module.apply(variables, x, use_running_average=False,
                            mutable=['batch_stats'])
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
        return jnp.sum(jnp.tanh(y) * w) / y.size

    g1 = jax.grad(lambda v, x: loss(ours, v, x), argnums=(0, 1))(v_ours, x)
    g2 = jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(v_ref, x)

    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=2e-5, err_msg='dx')
    np.testing.assert_allclose(
        np.asarray(g1[0]['params']['scale']),
        np.asarray(g2[0]['params']['scale']), rtol=1e-5, atol=2e-5,
        err_msg='dgamma')
    np.testing.assert_allclose(
        np.asarray(g1[0]['params']['bias']),
        np.asarray(g2[0]['params']['bias']), rtol=1e-5, atol=2e-5,
        err_msg='dbeta')


def test_eval_mode_uses_running_stats():
    x, ours, _, v_ours, _ = _setup()
    stats = {'mean': jnp.full((6,), 0.5), 'var': jnp.full((6,), 4.0)}
    v = {'params': v_ours['params'], 'batch_stats': stats}
    y = ours.apply(v, x, use_running_average=True)
    want = (np.asarray(x, np.float32) - 0.5) / np.sqrt(4.0 + 1e-5)
    want = want * np.asarray(v['params']['scale']) + \
        np.asarray(v['params']['bias'])
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_bf16_activation_path():
    x, ours, _, v_ours, _ = _setup(dtype=jnp.bfloat16, seed=1)

    def loss(v, x):
        y, _ = ours.apply(v, x, use_running_average=False,
                          mutable=['batch_stats'])
        return jnp.sum(y.astype(jnp.float32) ** 2) / y.size

    g = jax.grad(loss, argnums=1)(v_ours, x)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()
