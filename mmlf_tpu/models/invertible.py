"""Invertible-network (INN) path — disabled, matching the reference.

The reference ships an INN variant ("zixels" + GMM readout,
mmlf/model/invertible.py + coupling_blocks.py) but it is dead code: the CLIs
comment out its imports and training raises
``NotImplementedError('INNs are not supported anymore')``
(reference mmlf/train/cli.py:251-253).  Its FrEIA dependency is not even in
the reference's requirements.txt.

For CLI parity the ``--model_invertible`` flag exists here too and fails
identically.  ``mmlf_tpu.losses.information_bottleneck`` implements the
orphaned loss for completeness.
"""

from __future__ import annotations

NOT_SUPPORTED_MSG = 'INNs are not supported anymore'


class Invertible:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(NOT_SUPPORTED_MSG)


class ZixelWrapper:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(NOT_SUPPORTED_MSG)
