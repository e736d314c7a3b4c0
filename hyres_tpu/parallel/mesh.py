"""Device mesh / sharding helpers (data parallelism and beyond).

The reference's only parallelism is single-process ``nn.DataParallel``
over local GPUs (/root/reference/src/utils/dataset_utils.py:76-82,
src/training.py:211-212). The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over all devices with the batch sharded on the
'data' axis and parameters replicated; XLA inserts the gradient psum
over ICI. The same helpers scale to multi-host by building the mesh
from ``jax.devices()`` after ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       batch_size: Optional[int] = None) -> Mesh:
    """1-D 'data' mesh over the devices.

    If batch_size is given and not divisible by the device count, the
    mesh shrinks to the largest divisor (the reference's DataParallel
    accepts any batch; a hard divisibility error on tiny debug batches
    would be a regression)."""
    devices = list(devices if devices is not None else jax.devices())
    if batch_size is not None:
        while len(devices) > 1 and batch_size % len(devices):
            devices = devices[: len(devices) // 2]
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Shard leading (batch) axis over the 'data' mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
