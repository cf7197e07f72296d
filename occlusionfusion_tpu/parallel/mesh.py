"""Device-mesh construction and sharding specs.

The reference is single-process single-GPU (SURVEY.md §2.3); distribution
here is designed fresh for TPU: a ``(data, space)`` mesh where the data
axis carries frame/clip batches (training, multi-sequence serving) and the
space axis shards the TSDF volume and graph-node partitions. XLA inserts
the collectives (psum for gradient/JtJ reductions, all-gather for node
states) from the sharding annotations; explicit shard_map paths exist for
the halo-exchange stencils.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_fusion_mesh(n_devices: int | None = None, space: int = 1) -> Mesh:
    """1- or 2-axis mesh: ('data',) or ('data', 'space')."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if space > 1:
        assert n % space == 0, (n, space)
        arr = np.asarray(devices).reshape(n // space, space)
        return Mesh(arr, ("data", "space"))
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def volume_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """TSDF volumes shard along their leading (x) voxel axis: per-voxel
    integrate/warp math is embarrassingly parallel, so the only
    communication is the (replicated) camera image broadcast; marching
    cubes pulls the volume to host anyway."""
    return NamedSharding(mesh, P(axis))
