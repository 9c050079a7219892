"""Device mesh + sharding layer — the entire distributed story.

Replaces the reference's parallel layer wholesale (SURVEY.md §2.6):

- ``nn.DataParallel`` scatter/gather (``utils/init_trainer.py:310-313``) →
  a 1-D ``Mesh(('data',))`` with the batch dimension sharded and parameters
  replicated. XLA GSPMD emits the gradient all-reduce over ICI; the same
  program scales to multi-host (DCN) untouched.
- ``sync_batchnorm/`` (master/slave thread pipes,
  ``network/backbone/sync_batchnorm/comm.py:18-129``) → nothing: BatchNorm's
  batch moments are ``jnp.mean`` over a batch-sharded axis, which XLA lowers
  to a cross-replica reduction automatically.

The mesh is deliberately N-D-ready: ``make_mesh`` takes an axis spec so a
('data', 'model') mesh with spatially-sharded activations (the full-res
2048×1024 case) is the same entry point.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Host numpy batch → device arrays with the batch dim sharded.

    Scalars/1-per-batch metadata are replicated. The two-view contrastive
    batch keeps both views of a sample on the same shard only if the global
    batch is laid out [view0..., view1...] with B divisible by the mesh —
    the contrastive losses are computed on gathered features anyway (they are
    tiny), so view placement does not affect correctness.
    """
    sharded = {}
    bs = batch_sharding(mesh, axis)
    repl = replicate_sharding(mesh)
    for k, v in batch.items():
        if isinstance(v, (list, tuple)) or v is None:
            continue  # metadata stays on host
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] % mesh.devices.size == 0:
            sharded[k] = jax.device_put(arr, bs)
        else:
            sharded[k] = jax.device_put(arr, repl)
    return sharded
