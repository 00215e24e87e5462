"""Device mesh construction (SURVEY.md §2b N11).

The codec's parallelism vocabulary (SURVEY.md §2b N10 records why TP/PP/EP/
ring-attention do not apply to this workload):

  'data' — independent clips (embarrassingly parallel, N7). May cross DCN.
  'seq'  — the frame axis of one clip (halo exchange + reservoir carry,
           N8/N9). Must ride ICI, so it is the innermost mesh axis.

On multi-host slices call `jax.distributed.initialize()` before building
the mesh; XLA compiles the `ppermute`/`psum` collectives over ICI within a
slice and DCN across hosts — there is no hand-written communication
backend to maintain (the reference codec is single-process; SURVEY.md §0).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_seq: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'seq') mesh. Defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_seq
    if n_data * n_seq != n:
        raise ValueError(f"mesh {n_data}x{n_seq} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (clip) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (clip) axis over 'data' and sample axis on 'seq'."""
    return NamedSharding(mesh, P("data", "seq"))
