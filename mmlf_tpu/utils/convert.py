"""Convert reference PyTorch checkpoints to mmlf_tpu flax variables.

The reference stores ``checkpoint.pt`` with a ``model_state_dict`` of the
torch ``FeedForward`` (reference mmlf/utils/dl.py:63-74).  This module maps
that state dict onto our flax parameter tree so released reference weights
can be evaluated for metric parity.

Key mapping (torch Sequential indices → flax module names):

  ``in_net_hv.<b>.0`` (Conv)      → ``params/in_net_hv/block<b>/conv1``
  ``in_net_hv.<b>.2`` (Conv)      → ``params/in_net_hv/block<b>/conv2``
  ``in_net_hv.<b>.3`` (BatchNorm) → ``params/in_net_hv/block<b>/bn`` +
                                     ``batch_stats/...``
  ``in_net_id.*``, ``out_net.*``  → likewise

Conv kernels transpose OIHW → HWIO.  Input-channel order is identical
(view-major, color-minor) because both models fold ``(n, 3)`` the same way.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(kernel_oihw, bias):
    return {
        'kernel': np.ascontiguousarray(
            np.transpose(np.asarray(kernel_oihw), (2, 3, 1, 0))),
        'bias': np.asarray(bias),
    }


def torch_state_to_flax(state_dict: Dict[str, 'np.ndarray'], *,
                        in_blocks: int, out_blocks: int,
                        no_batchnorm: bool = False,
                        cross: bool = False) -> dict:
    """Build ``{'params': ..., 'batch_stats': ...}`` from a torch state dict.

    ``state_dict`` values may be torch tensors or numpy arrays.
    """
    sd = {k: np.asarray(getattr(v, 'numpy', lambda: v)())
          for k, v in state_dict.items()}

    params: dict = {}
    stats: dict = {}

    def convert_net(torch_prefix: str, flax_name: str, n_blocks: int,
                    last_has_bn_relu: bool):
        p_net: dict = {}
        s_net: dict = {}
        for b in range(n_blocks):
            block = {
                'conv1': _conv(sd[f'{torch_prefix}.{b}.0.weight'],
                               sd[f'{torch_prefix}.{b}.0.bias']),
                'conv2': _conv(sd[f'{torch_prefix}.{b}.2.weight'],
                               sd[f'{torch_prefix}.{b}.2.bias']),
            }
            has_bn = (not no_batchnorm) and \
                (last_has_bn_relu or b < n_blocks - 1)
            if has_bn:
                block['bn'] = {
                    'scale': sd[f'{torch_prefix}.{b}.3.weight'],
                    'bias': sd[f'{torch_prefix}.{b}.3.bias'],
                }
                s_net[f'block{b}'] = {'bn': {
                    'mean': sd[f'{torch_prefix}.{b}.3.running_mean'],
                    'var': sd[f'{torch_prefix}.{b}.3.running_var'],
                }}
            p_net[f'block{b}'] = block
        params[flax_name] = p_net
        if s_net:
            stats[flax_name] = s_net

    convert_net('in_net_hv', 'in_net_hv', in_blocks, last_has_bn_relu=True)
    if not cross:
        convert_net('in_net_id', 'in_net_id', in_blocks,
                    last_has_bn_relu=True)
    convert_net('out_net', 'out_net', out_blocks, last_has_bn_relu=False)

    return {'params': params, 'batch_stats': stats}


def load_reference_checkpoint(path: str) -> tuple:
    """Load a reference ``checkpoint.pt``; returns (flax_variables, config).

    Requires torch (CPU) for unpickling.  Temporary ``*tmp*`` keys are
    stripped like the reference resume path (mmlf/train/cli.py:142-145).
    """
    import torch

    from ..config import Config

    state = torch.load(path, map_location='cpu', weights_only=False)
    sd = {k: v for k, v in state['model_state_dict'].items()
          if 'tmp' not in k}
    cfg = Config.from_dict(state['hyper_parameters']).finalize()
    variables = torch_state_to_flax(
        sd, in_blocks=cfg.model_in_blocks, out_blocks=cfg.model_out_blocks,
        no_batchnorm=cfg.model_no_batchnorm, cross=cfg.model_cross)
    return variables, cfg
