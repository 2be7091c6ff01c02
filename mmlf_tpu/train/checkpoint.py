"""Checkpointing: single rolling checkpoint carrying the full config.

Contract parity with the reference's ``ModelSaver`` + resume path
(reference mmlf/utils/dl.py:7-74, mmlf/train/cli.py:137-157):

  * one rolling checkpoint per output dir, saved at every validation
    interval, containing model state, optimizer state, the **full
    hyper-parameter dict**, epoch, iteration, and loss;
  * ``validate.cli`` reconstructs the model from the *stored* config with
    only a whitelisted set of CLI overrides;
  * resume restores optimizer state + iteration and force-resets the LR
    (the LR is recomputed from config + step each train step here, so the
    reset is automatic);
  * optional ``only_best`` mode.

On-disk format: ``checkpoint.msgpack`` (flax.serialization of the state
pytree) + ``hyper_parameters.json`` — readable without pickle.  Torch
checkpoints from the reference can be converted via utils/convert.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

CKPT_FILE = 'checkpoint.msgpack'
HYPER_FILE = 'hyper_parameters.json'


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(out_dir: str, state_tree: dict,
                    hyper_parameters: dict, epoch: Optional[int],
                    iteration: int, loss: Optional[float],
                    **extras: Any) -> None:
    payload = dict(state_tree)
    payload['__meta__'] = {
        'epoch': -1 if epoch is None else int(epoch),
        'iteration': int(iteration),
        'loss': float('nan') if loss is None else float(loss),
    }
    payload.update({k: _to_host(v) for k, v in extras.items()})

    data = serialization.to_bytes(_to_host(payload))
    tmp = os.path.join(out_dir, CKPT_FILE + '.tmp')
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, os.path.join(out_dir, CKPT_FILE))

    with open(os.path.join(out_dir, HYPER_FILE), 'w') as f:
        json.dump(hyper_parameters, f, indent=2, default=str)


def load_checkpoint(out_dir: str, state_template: dict):
    """Restore a checkpoint into the shape of ``state_template``.

    Returns (state_tree, meta_dict, hyper_parameters).
    """
    with open(os.path.join(out_dir, CKPT_FILE), 'rb') as f:
        data = f.read()
    template = dict(state_template)
    template['__meta__'] = {'epoch': 0, 'iteration': 0, 'loss': 0.0}
    restored = serialization.from_bytes(template, data)
    meta = restored.pop('__meta__')
    with open(os.path.join(out_dir, HYPER_FILE)) as f:
        hyper = json.load(f)
    return restored, meta, hyper


def load_checkpoint_raw(out_dir: str):
    """Template-free restore: returns (nested-dict tree, meta, hyper).

    Tuples/namedtuples in the saved tree come back as index-keyed dicts —
    fine for consumers that only need ``params`` / ``batch_stats``
    (e.g. the validate CLI, which ignores optimizer state).
    """
    with open(os.path.join(out_dir, CKPT_FILE), 'rb') as f:
        restored = serialization.msgpack_restore(f.read())
    meta = restored.pop('__meta__')
    with open(os.path.join(out_dir, HYPER_FILE)) as f:
        hyper = json.load(f)
    return restored, meta, hyper


def has_checkpoint(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, CKPT_FILE))


class ModelSaver:
    """Rolling saver with optional best-only mode (reference dl.py:7-74)."""

    def __init__(self, only_best: bool = False):
        self.only_best = only_best
        self.best_loss = None

    def __call__(self, out_dir: str, state_tree: dict,
                 hyper_parameters: dict, epoch: Optional[int],
                 iteration: int, loss: Optional[float], **extras) -> bool:
        if self.only_best and loss is not None:
            if self.best_loss is not None and self.best_loss < loss:
                return False
            self.best_loss = loss
        save_checkpoint(out_dir, state_tree, hyper_parameters, epoch,
                        iteration, loss, **extras)
        return True
