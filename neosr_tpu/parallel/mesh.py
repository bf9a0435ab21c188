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


def _batch_spec(x, spatial: bool):
    if x.ndim == 4 and spatial:
        # NHWC: batch over `data`, image height over `space` — the
        # spatial-parallel (context-parallel analog) layout; GSPMD
        # inserts halo exchanges for convs/windows over ICI
        return P("data", "space", None, None)
    if x.ndim >= 1:
        return P("data", *([None] * (x.ndim - 1)))
    return P()


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict onto the mesh, N sharded over `data`.

    Per-host data loading feeds each process only its shard.  On a single
    process this distributes the global batch across local devices via
    device_put; under `jax.process_count() > 1` each process holds only
    its slice of the global batch (EnlargedSampler strides by process),
    so the global array is assembled with
    `jax.make_array_from_process_local_data` — the multi-host analog of
    the reference's per-rank DDP feeding (dist_util.py:12-62).
    """
    spatial = mesh.shape.get("space", 1) > 1
    multiprocess = jax.process_count() > 1

    def _place(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        spec = _batch_spec(x, spatial)
        sharding = NamedSharding(mesh, spec)
        if multiprocess and x.ndim >= 1:
            # local shard -> global array: x is THIS process's rows of the
            # global batch; global batch dim = local * process_count
            global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(_place, batch)


def process_local_slice(global_batch_size: int) -> slice:
    """The rows of a global batch this process loads (contiguous block
    layout, consistent with make_array_from_process_local_data's
    process-major order and EnlargedSampler's per-process striding).
    """
    n = jax.process_count()
    if global_batch_size % n:
        msg = (
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
        raise ValueError(msg)
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
