"""Device mesh construction and batch sharding.

The reference is a single-core library: one decoder instance = one stream,
and parallelism is the caller's problem (SURVEY.md §2 parallelism table).
In the TPU framework, DATA PARALLELISM OVER STREAMS is the first-class axis:
every kernel operates on ``[batch, ...]`` tensors and the batch dimension is
sharded across chips with ``jax.sharding``.  The math has no cross-stream
coupling, so the only collectives are layout moves XLA inserts at feed /
gather boundaries — they ride ICI, never block the per-chip compute.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stream_mesh", "batch_sharding", "axis_sharding", "shard_streams",
           "shard_streams_axis"]

STREAM_AXIS = "streams"


def stream_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``streams``.

    Audio preprocessing is embarrassingly parallel across streams, so a flat
    1-D mesh is the right topology; there is no TP/PP axis to trade off
    against (SURVEY.md §2: TP/PP/EP are N/A for this workload).
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (STREAM_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Sharding that splits the leading (stream/batch) dim across the mesh."""
    return NamedSharding(mesh, P(STREAM_AXIS, *([None] * (ndim - 1))))


def axis_sharding(mesh: Mesh, ndim: int, axis: int) -> NamedSharding:
    """Sharding that splits dimension ``axis`` across the mesh (the MP3 run
    tensors are granule-major ``[G, B, ...]``, so their stream axis is 1)."""
    spec = [None] * ndim
    spec[axis] = STREAM_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_streams(x: jax.Array, mesh: Mesh | None = None) -> jax.Array:
    """Place ``x`` with its leading dim sharded over the stream mesh.

    Pads nothing: callers are expected to bucket batches to a multiple of the
    mesh size (the stream scheduler does this).
    """
    if mesh is None:
        mesh = stream_mesh()
    return jax.device_put(x, batch_sharding(mesh, x.ndim))


def shard_streams_axis(x, axis: int, mesh: Mesh) -> jax.Array:
    """Place ``x`` with dimension ``axis`` sharded over the stream mesh."""
    return jax.device_put(x, axis_sharding(mesh, np.ndim(x), axis))
