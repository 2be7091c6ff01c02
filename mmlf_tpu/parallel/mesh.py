"""Device-mesh and sharding helpers.

The reference's only parallelism is single-process ``DataParallel``
(reference mmlf/train/cli.py:159: replicate module, scatter batch, gather,
grad all-reduce inside autograd).  The TPU-native equivalent is a 1-D
``data`` mesh: the global batch is sharded over the mesh, parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI when the jitted
train step computes a mean loss over the sharded batch.  BatchNorm statistics
are *global* under this scheme (a batch-axis mean is a global mean under
jit) — unlike the reference's per-replica BN; see models/feed_forward.py.

A second optional ``space`` axis shards full-scene inference spatially
(512×512 validation scenes): annotating the H dimension lets XLA's SPMD
partitioner run the fully-convolutional net with automatic halo exchange.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, n_space: int = 1,
              devices=None) -> Mesh:
    """Create a ``('data', 'space')`` mesh over the available devices.

    :param n_data: data-parallel size; 0 = all devices / n_space
    """
    devices = devices if devices is not None else jax.devices()
    if n_data == 0:
        n_data = len(devices) // n_space
    use = n_data * n_space
    import numpy as np
    dev_array = np.asarray(devices[:use]).reshape(n_data, n_space)
    return Mesh(dev_array, ('data', 'space'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` mesh axis."""
    return NamedSharding(mesh, P('data'))


def spatial_sharding(mesh: Mesh, h_axis: int = 2) -> NamedSharding:
    """Shard a scene's H dimension over the ``space`` axis (stack layout
    ``(b, n, H, W, 3)`` → axis 2)."""
    spec = [None] * (h_axis + 1)
    spec[h_axis] = 'space'
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], tree):
    """Device-put a host batch with the batch axis sharded over ``data``."""
    if mesh is None:
        return tree
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), tree)
