"""Fold eval-mode BatchNorm into the preceding convolution.

At inference BN is an affine map with frozen statistics:
``y = scale * (x - mean) / sqrt(var + eps) + bias``.  Each ConvBlock ends
``conv2 → BN`` (models/feed_forward.py), so the BN folds exactly into
conv2's kernel/bias — one fewer full-activation pass per block, which the
70-member ESE ensemble pays 70 times per scene.

Only the fully-convolutional trunk qualifies (the U-Net variant interleaves
BN *after* ReLU); the validate CLI folds automatically for eligible models.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5


def _fold_block(block_params: dict, block_stats: dict) -> dict:
    bn = block_params['bn']
    stats = block_stats['bn']
    s = np.asarray(bn['scale']) / np.sqrt(
        np.asarray(stats['var']) + BN_EPS)

    conv2 = block_params['conv2']
    out = dict(block_params)
    out['conv2'] = {
        'kernel': np.asarray(conv2['kernel']) * s,          # (..., O) * (O,)
        'bias': (np.asarray(conv2['bias']) - np.asarray(stats['mean'])) * s
        + np.asarray(bn['bias']),
    }
    out.pop('bn')
    return out


def fold_batchnorm(variables: dict) -> dict:
    """Return eval-equivalent variables with all block BNs folded away.

    :param variables: ``{'params': ..., 'batch_stats': ...}`` of a
        FeedForward model built with the fully-conv out net
    :returns: ``{'params': ..., 'batch_stats': {}}`` for the same model
        constructed with ``model_no_batchnorm=True``
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})

    new_params = {}
    for net_name, net in params.items():
        if not isinstance(net, dict) or not any(
                k.startswith('block') for k in net):
            new_params[net_name] = net
            continue
        net_stats = stats.get(net_name, {})
        new_net = {}
        for block_name, block in net.items():
            if isinstance(block, dict) and 'bn' in block:
                new_net[block_name] = _fold_block(
                    block, net_stats[block_name])
            else:
                new_net[block_name] = block
        new_params[net_name] = new_net

    return {'params': new_params, 'batch_stats': {}}
