"""Device mesh and sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(`src/train.py:212-214`); the TPU-native equivalent is a 1-D data mesh with
NamedSharding: batches shard over the 'data' axis, parameters replicate, and
XLA inserts the gradient psum over ICI.  Semantics match DataParallel
(per-device batch shards, summed/averaged gradients).

The model is ~10M parameters, so no tensor/pipeline parallelism is needed for
parity; the mesh helpers still accept an arbitrary device list so multi-host
DCN meshes compose later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place every array in `batch` with its leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate every array (parameters, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
