"""Device mesh and sharding layer.

The reference is single-process single-GPU (trainers/wrapper.py:16); the
TPU-native replacement is a 1-D ``Mesh(('data',))`` over ICI with
batch-sharded inputs and fully replicated parameters/EMA (SURVEY.md §2's
TPU-native plan).  All collectives (gradient psum) are inserted by XLA
from the sharding annotations — nothing is hand-written.

The mesh abstraction does not preclude more axes: ``create_mesh`` takes
an arbitrary shape + axis names, so FSDP-style parameter sharding for
the 256^2 configs can be layered on by adding a 'model' axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host (DCN) initialization entry point.

    Wraps ``jax.distributed.initialize`` so multi-host slices join one
    global mesh: after this, ``jax.devices()`` spans every host and
    ``create_mesh`` lays the 'data' axis across ICI within a slice and
    DCN across slices (XLA routes collectives accordingly).

    Arguments may be omitted: on TPU pods JAX autodetects them from the
    environment; elsewhere they fall back to JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.  A single-process run (no
    coordinator configured) is a no-op, as is a second call.

    Returns the process index (0 for single-process).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    single = coordinator_address is None and (num_processes or 1) == 1
    if not single:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:  # second call: keep the live client
            if "already" not in str(e).lower():
                raise
    return jax.process_index()


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Create a device mesh. Default: all local devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    mesh_devices = mesh_utils.create_device_mesh(
        shape, devices=devices[:n], allow_split_physical_axes=True
    )
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, EMA, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with its leading dim sharded over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, replicated(mesh))
