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


def _conv_transpose(kernel_iohw, bias):
    """torch ConvTranspose2d (in, out, kH, kW) → flax ConvTranspose HWIO.

    flax's ``nn.ConvTranspose`` correlates the zero-dilated input with the
    kernel as-is, while torch's transposed conv scatters with it — the two
    agree when the spatial taps are flipped (verified numerically)."""
    k = np.transpose(np.asarray(kernel_iohw), (2, 3, 0, 1))[::-1, ::-1]
    return {'kernel': np.ascontiguousarray(k), 'bias': np.asarray(bias)}


def _convert_unet(sd: Dict[str, np.ndarray], prefix: str,
                  depth: int = 5) -> tuple:
    """Convert the reference U-Net out-net (reference mmlf/model/unet.py,
    instantiated with padding=True, batch_norm=True, up_mode='upconv' from
    feed_forward.py:189-204) into our ``models/unet.py`` tree.

    torch layout per UNetConvBlock (with batch_norm): Sequential indices
    0=Conv, 2=BatchNorm, 3=Conv, 5=BatchNorm.  torch ``up_path[j]`` is built
    for ``i = depth-2-j`` in our ``up{i}`` naming (reference unet.py:57-62).
    """
    params: dict = {}
    stats: dict = {}

    def conv_block(tpfx: str) -> tuple:
        p = {
            'conv0': _conv(sd[f'{tpfx}.0.weight'], sd[f'{tpfx}.0.bias']),
            'conv1': _conv(sd[f'{tpfx}.3.weight'], sd[f'{tpfx}.3.bias']),
            'bn0': {'scale': sd[f'{tpfx}.2.weight'],
                    'bias': sd[f'{tpfx}.2.bias']},
            'bn1': {'scale': sd[f'{tpfx}.5.weight'],
                    'bias': sd[f'{tpfx}.5.bias']},
        }
        s = {
            'bn0': {'mean': sd[f'{tpfx}.2.running_mean'],
                    'var': sd[f'{tpfx}.2.running_var']},
            'bn1': {'mean': sd[f'{tpfx}.5.running_mean'],
                    'var': sd[f'{tpfx}.5.running_var']},
        }
        return p, s

    for i in range(depth):
        p, s = conv_block(f'{prefix}down_path.{i}.block')
        params[f'down{i}'] = p
        stats[f'down{i}'] = s
    for j in range(depth - 1):
        i = depth - 2 - j
        p, s = conv_block(f'{prefix}up_path.{j}.conv_block.block')
        params[f'up{i}'] = {
            'up': _conv_transpose(sd[f'{prefix}up_path.{j}.up.weight'],
                                  sd[f'{prefix}up_path.{j}.up.bias']),
            'conv_block': p,
        }
        stats[f'up{i}'] = {'conv_block': s}
    params['last'] = _conv(sd[f'{prefix}last.weight'],
                           sd[f'{prefix}last.bias'])
    return params, stats


def torch_state_to_flax(state_dict: Dict[str, 'np.ndarray'], *,
                        in_blocks: int, out_blocks: int,
                        no_batchnorm: bool = False,
                        cross: bool = False,
                        unet: bool = False) -> dict:
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
    if unet:
        params['out_net'], stats['out_net'] = _convert_unet(sd, 'out_net.')
    else:
        convert_net('out_net', 'out_net', out_blocks, last_has_bn_relu=False)

    return {'params': params, 'batch_stats': stats}


def _deconv(flax_conv: dict) -> tuple:
    """flax HWIO conv → torch (OIHW weight, bias)."""
    k = np.transpose(np.asarray(flax_conv['kernel']), (3, 2, 0, 1))
    return np.ascontiguousarray(k), np.asarray(flax_conv['bias'])


def _deconv_transpose(flax_conv: dict) -> tuple:
    """flax ConvTranspose HWIO → torch ConvTranspose2d (in, out, kH, kW).

    Exact inverse of :func:`_conv_transpose` (the (2,3,0,1) permutation is
    an involution; unflip the spatial taps first)."""
    k = np.asarray(flax_conv['kernel'])[::-1, ::-1]
    k = np.transpose(k, (2, 3, 0, 1))
    return np.ascontiguousarray(k), np.asarray(flax_conv['bias'])


def _export_unet(params: dict, stats: dict, prefix: str,
                 sd: Dict[str, np.ndarray], depth: int = 5) -> None:
    """Inverse of :func:`_convert_unet`: write our U-Net out-net variables
    into a reference-format torch state dict (reference mmlf/model/unet.py
    Sequential layout: 0=Conv, 2=BatchNorm, 3=Conv, 5=BatchNorm)."""

    def export_block(p: dict, s: dict, tpfx: str) -> None:
        for flax_c, flax_b, ti_c, ti_b in (('conv0', 'bn0', 0, 2),
                                           ('conv1', 'bn1', 3, 5)):
            w, bias = _deconv(p[flax_c])
            sd[f'{tpfx}.{ti_c}.weight'] = w
            sd[f'{tpfx}.{ti_c}.bias'] = bias
            sd[f'{tpfx}.{ti_b}.weight'] = np.asarray(p[flax_b]['scale'])
            sd[f'{tpfx}.{ti_b}.bias'] = np.asarray(p[flax_b]['bias'])
            sd[f'{tpfx}.{ti_b}.running_mean'] = np.asarray(
                s[flax_b]['mean'])
            sd[f'{tpfx}.{ti_b}.running_var'] = np.asarray(s[flax_b]['var'])
            sd[f'{tpfx}.{ti_b}.num_batches_tracked'] = np.asarray(
                0, dtype=np.int64)

    for i in range(depth):
        export_block(params[f'down{i}'], stats[f'down{i}'],
                     f'{prefix}down_path.{i}.block')
    for j in range(depth - 1):
        i = depth - 2 - j
        w, bias = _deconv_transpose(params[f'up{i}']['up'])
        sd[f'{prefix}up_path.{j}.up.weight'] = w
        sd[f'{prefix}up_path.{j}.up.bias'] = bias
        export_block(params[f'up{i}']['conv_block'],
                     stats[f'up{i}']['conv_block'],
                     f'{prefix}up_path.{j}.conv_block.block')
    w, bias = _deconv(params['last'])
    sd[f'{prefix}last.weight'] = w
    sd[f'{prefix}last.bias'] = bias


def flax_to_torch_state(variables: dict, *, in_blocks: int, out_blocks: int,
                        no_batchnorm: bool = False,
                        cross: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_to_flax` for the conv trunk: export our
    flax variables as a reference-format torch state dict (numpy values), so
    checkpoints trained here can be loaded by the reference implementation
    (reference mmlf/validate/cli.py:227-234) or compared against its models.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    unet = 'down0' in params.get('out_net', {})
    sd: Dict[str, np.ndarray] = {}

    def export_net(flax_name: str, torch_prefix: str, n_blocks: int,
                   last_has_bn_relu: bool):
        p_net = params[flax_name]
        s_net = stats.get(flax_name, {})
        for b in range(n_blocks):
            blk = p_net[f'block{b}']
            w, bias = _deconv(blk['conv1'])
            sd[f'{torch_prefix}.{b}.0.weight'] = w
            sd[f'{torch_prefix}.{b}.0.bias'] = bias
            w, bias = _deconv(blk['conv2'])
            sd[f'{torch_prefix}.{b}.2.weight'] = w
            sd[f'{torch_prefix}.{b}.2.bias'] = bias
            if 'bn' in blk:
                sd[f'{torch_prefix}.{b}.3.weight'] = np.asarray(
                    blk['bn']['scale'])
                sd[f'{torch_prefix}.{b}.3.bias'] = np.asarray(
                    blk['bn']['bias'])
                bn_s = s_net[f'block{b}']['bn']
                sd[f'{torch_prefix}.{b}.3.running_mean'] = np.asarray(
                    bn_s['mean'])
                sd[f'{torch_prefix}.{b}.3.running_var'] = np.asarray(
                    bn_s['var'])
                sd[f'{torch_prefix}.{b}.3.num_batches_tracked'] = np.asarray(
                    0, dtype=np.int64)

    export_net('in_net_hv', 'in_net_hv', in_blocks, last_has_bn_relu=True)
    if not cross:
        export_net('in_net_id', 'in_net_id', in_blocks,
                   last_has_bn_relu=True)
    if unet:
        _export_unet(params['out_net'], stats['out_net'], 'out_net.', sd)
    else:
        export_net('out_net', 'out_net', out_blocks, last_has_bn_relu=False)
    return sd


def save_reference_checkpoint(path: str, variables: dict, cfg,
                              epoch=None, iteration: int = 0,
                              loss: float = 0.0) -> None:
    """Write a reference-format ``checkpoint.pt`` from our flax variables
    (payload contract: reference mmlf/utils/dl.py:63-74)."""
    import torch

    cfg_dict = cfg if isinstance(cfg, dict) else cfg.to_dict()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim else
          torch.tensor(v) for k, v in flax_to_torch_state(
              variables, in_blocks=cfg_dict['model_in_blocks'],
              out_blocks=cfg_dict['model_out_blocks'],
              no_batchnorm=cfg_dict.get('model_no_batchnorm', False),
              cross=cfg_dict.get('model_cross', False)).items()}
    torch.save({'model_state_dict': sd, 'optimizer_state_dict': None,
                'hyper_parameters': cfg_dict, 'epoch': epoch,
                'iteration': iteration, 'loss': loss}, path)


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
        no_batchnorm=cfg.model_no_batchnorm, cross=cfg.model_cross,
        unet=cfg.model_unet)
    return variables, cfg
