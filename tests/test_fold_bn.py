"""BN folding must be eval-equivalent to the unfolded model."""

import numpy as np
import jax
import jax.numpy as jnp

from mmlf_tpu.config import Config
from mmlf_tpu.models import FeedForward
from mmlf_tpu.utils.fold_bn import fold_batchnorm


def test_folded_matches_unfolded_eval():
    cfg = Config(model_chs=6, model_in_blocks=2, model_out_blocks=3,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((2, 9, 24, 24, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    # non-trivial running stats
    def perturb(tree, key):
        return jax.tree_util.tree_map(
            lambda x: x + 0.3 * np.random.default_rng(key).normal(
                size=x.shape).astype(np.float32), tree)
    variables = {'params': perturb(variables['params'], 1),
                 'batch_stats': jax.tree_util.tree_map(
                     lambda x: np.abs(np.asarray(x)) + 0.5,
                     variables['batch_stats'])}

    want = model.apply(variables, *stacks)

    folded = fold_batchnorm(variables)
    cfg_nobn = Config(model_chs=6, model_in_blocks=2, model_out_blocks=3,
                      model_uncert=True,
                      model_no_batchnorm=True).finalize()
    model_nobn = FeedForward.from_config(cfg_nobn)
    got = model_nobn.apply(folded, *stacks)

    np.testing.assert_allclose(np.asarray(got['mean']),
                               np.asarray(want['mean']), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got['logvar']),
                               np.asarray(want['logvar']), atol=2e-5)
