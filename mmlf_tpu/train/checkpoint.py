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


def _build_payload(state_tree: dict, epoch: Optional[int], iteration: int,
                   loss: Optional[float], **extras: Any) -> dict:
    """Host snapshot of the checkpoint payload (the blocking D2H part).

    ``epoch``: the reference stores None at train time (it passes
    ``epoch=None``, reference train/cli.py:328); we store the real pass
    counter when the caller provides it, -1 for None.
    """
    payload = dict(state_tree)
    payload['__meta__'] = {
        'epoch': -1 if epoch is None else int(epoch),
        'iteration': int(iteration),
        'loss': float('nan') if loss is None else float(loss),
    }
    payload.update(extras)
    return _to_host(payload)


def _write_checkpoint(out_dir: str, payload: dict,
                      hyper_parameters: dict) -> None:
    data = serialization.to_bytes(payload)
    tmp = os.path.join(out_dir, CKPT_FILE + '.tmp')
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, os.path.join(out_dir, CKPT_FILE))

    with open(os.path.join(out_dir, HYPER_FILE), 'w') as f:
        json.dump(hyper_parameters, f, indent=2, default=str)


def save_checkpoint(out_dir: str, state_tree: dict,
                    hyper_parameters: dict, epoch: Optional[int],
                    iteration: int, loss: Optional[float],
                    **extras: Any) -> None:
    _write_checkpoint(out_dir,
                      _build_payload(state_tree, epoch, iteration, loss,
                                     **extras),
                      hyper_parameters)


def load_checkpoint(out_dir: str, state_template: dict):
    """Restore a checkpoint into the shape of ``state_template``.

    Returns (state_tree, meta_dict, hyper_parameters).
    """
    raw, meta, hyper = load_checkpoint_raw(out_dir)
    raw['__meta__'] = meta
    restored, meta = restore_from_raw(raw, state_template)
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


def restore_from_raw(raw: dict, state_template: dict):
    """Shape an already-decoded raw tree (``load_checkpoint_raw``) into
    ``state_template`` — the second half of ``load_checkpoint`` without
    re-reading and re-decoding the file.  Returns (state_tree, meta).
    """
    template = dict(state_template)
    template['__meta__'] = {'epoch': 0, 'iteration': 0, 'loss': 0.0}
    restored = serialization.from_state_dict(template, raw)
    meta = restored.pop('__meta__')
    return restored, meta


def has_checkpoint(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, CKPT_FILE))


class ModelSaver:
    """Rolling saver with optional best-only mode (reference dl.py:7-74).

    With ``async_write=True`` (default) the serialization + disk write run
    on a background thread so the train step loop only blocks for the
    device→host snapshot; a newer pending save supersedes an unwritten
    older one (the checkpoint is rolling anyway).  ``close()`` drains the
    queue; the atomic tmp+rename write keeps readers safe either way.
    """

    def __init__(self, only_best: bool = False, async_write: bool = True):
        self.only_best = only_best
        self.best_loss = None
        self.async_write = async_write
        self._pending = None
        self._lock = None
        self._thread = None
        self._error = None
        if async_write:
            import threading
            self._lock = threading.Condition()
            self._thread = threading.Thread(target=self._worker,
                                            daemon=True)
            self._closed = False
            self._thread.start()

    def _worker(self):
        while True:
            with self._lock:
                while self._pending is None and not self._closed:
                    self._lock.wait()
                if self._pending is None and self._closed:
                    return
                job, self._pending = self._pending, None
            try:
                _write_checkpoint(*job)
            except BaseException as e:       # noqa: BLE001
                # keep the writer alive (a later save may succeed, e.g.
                # after disk space is freed) and surface the failure on
                # the training thread at the next save/close
                with self._lock:
                    self._error = e

    def __call__(self, out_dir: str, state_tree: dict,
                 hyper_parameters: dict, epoch: Optional[int],
                 iteration: int, loss: Optional[float], **extras) -> bool:
        if self.only_best and loss is not None:
            if self.best_loss is not None and self.best_loss < loss:
                return False
            self.best_loss = loss
        # snapshot on the caller thread: donated device buffers are reused
        # by the next dispatched step, so the D2H copy cannot be deferred
        payload = _build_payload(state_tree, epoch, iteration, loss,
                                 **extras)
        if self.async_write:
            with self._lock:
                self._raise_pending_error()
                self._pending = (out_dir, payload, hyper_parameters)
                self._lock.notify()
        else:
            _write_checkpoint(out_dir, payload, hyper_parameters)
        return True

    def _raise_pending_error(self):
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError('async checkpoint write failed') from e

    def close(self):
        """Drain the writer (call at the end of training)."""
        if self.async_write:
            with self._lock:
                self._closed = True
                self._lock.notify()
            self._thread.join()
            self._raise_pending_error()
