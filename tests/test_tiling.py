"""Tiled inference must be exactly the full-image forward."""

import numpy as np
import jax
import jax.numpy as jnp

from mmlf_tpu.config import Config
from mmlf_tpu.models import FeedForward
from mmlf_tpu.validate.tiling import (make_tiled_forward, receptive_radius,
                                      tiled_forward)


def test_receptive_radius():
    # default config: 11 blocks × 2 convs × (k-1)=1 → 22
    assert receptive_radius(2, 3, 8) == 22


def test_tiled_matches_full_uncert():
    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((1, 9, 96, 96, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    full = model.apply(variables, *stacks)
    tiled = make_tiled_forward(model, tile=32)(variables, *stacks)

    np.testing.assert_allclose(tiled['mean'], np.asarray(full['mean']),
                               atol=1e-5)
    np.testing.assert_allclose(tiled['logvar'], np.asarray(full['logvar']),
                               atol=1e-5)
    np.testing.assert_allclose(tiled['posterior'],
                               np.asarray(full['posterior']), atol=1e-5)


def test_tiled_handles_non_divisible_sizes():
    cfg = Config(model_chs=4, model_in_blocks=1, model_out_blocks=1).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(1)
    stacks = [jnp.asarray(rng.random((1, 9, 72, 88, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    full = model.apply(variables, *stacks)
    halo = receptive_radius(2, 1, 1)
    fn = jax.jit(lambda v, *s: model.apply(v, *s))
    tiled = tiled_forward(fn, variables, stacks, tile=32, halo=halo)
    assert tiled['mean'].shape == (1, 72, 88)
    np.testing.assert_allclose(tiled['mean'], np.asarray(full['mean']),
                               atol=1e-5)
