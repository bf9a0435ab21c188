"""Device mesh construction and sharding helpers.

This replaces the reference's entire distributed stack (DDP/NCCL wrap at
/root/reference/neosr/models/base.py:120-149, EnlargedSampler rank striding,
`reduce_loss_dict` collectives) with the TPU-native formulation: a
`jax.sharding.Mesh` with a `data` axis (optionally a `space` axis for spatial
parallelism), batches sharded along `data`, parameters replicated.  Gradient
all-reduce is then *compiled in* by XLA as psum over ICI when the jitted
train step consumes sharded batches and produces replicated updates — no
explicit collectives in user code.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None,
    data_axis: int | None = None,
    space_axis: int = 1,
    devices: Any | None = None,
) -> Mesh:
    """Build a (data[, space]) mesh over the available devices.

    `space_axis > 1` carves out a spatial-parallel dimension (halo-exchange
    convs / sharded window attention over image height) — the TPU analog of
    context parallelism for very large images.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if data_axis is None:
        assert n % space_axis == 0, f"{n} devices not divisible by space={space_axis}"
        data_axis = n // space_axis
    dev_array = np.asarray(devices).reshape(data_axis, space_axis)
    return Mesh(dev_array, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over `data`, H over `space` (no-op when space=1)."""
    return NamedSharding(mesh, P("data", "space", None, None))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict onto the mesh, N sharded over `data`.

    Per-host data loading feeds each process only its shard; on a single
    host this distributes the global batch across local devices.
    """
    spatial = mesh.shape.get("space", 1) > 1

    def _place(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        if x.ndim == 4 and spatial:
            # NHWC: batch over `data`, image height over `space` — the
            # spatial-parallel (context-parallel analog) layout; GSPMD
            # inserts halo exchanges for convs/windows over ICI
            spec = P("data", "space", None, None)
        elif x.ndim >= 1:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_place, batch)
