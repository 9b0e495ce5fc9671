"""FSDP-style parameter sharding over the data axis.

SURVEY.md §2 calls for "optional FSDP-style parameter sharding for the
256^2 configs": parameters (and hence optimizer state + EMA) are sharded
across the 'data' mesh axis instead of replicated; XLA's SPMD partitioner
inserts the all-gathers before each use and reduce-scatters the
gradients — nothing is hand-written.

Rule: each parameter is sharded along its largest dimension divisible by
the mesh axis size; parameters too small to shard (norm scales, biases)
stay replicated.  This is a pytree-of-shardings, applied by device_put
and respected by jit through input shardings.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(shape, axis_size: int, min_size: int = 2 ** 16):
    """Shard the largest divisible dim; None spec if too small."""
    if not shape:
        return P()
    total = 1
    for d in shape:
        total *= d
    if total < min_size:
        return P()
    # prefer the last (output/feature) dims — contiguous lanes
    best = None
    for i in reversed(range(len(shape))):
        if shape[i] % axis_size == 0:
            if best is None or shape[i] > shape[best]:
                best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def fsdp_sharding(params: Any, mesh: Mesh, axis: str = "data",
                  min_size: int = 2 ** 16) -> Any:
    """Pytree of NamedShardings mirroring `params`."""
    axis_size = mesh.shape[axis]

    def leaf(p):
        return NamedSharding(mesh, _spec_for(p.shape, axis_size, min_size))

    return jax.tree.map(leaf, params)


def shard_params_fsdp(params: Any, mesh: Mesh, axis: str = "data",
                      min_size: int = 2 ** 16) -> Any:
    """device_put params with FSDP sharding."""
    return jax.device_put(params, fsdp_sharding(params, mesh, axis, min_size))


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data",
                     min_size: int = 2 ** 16):
    """Shard a TrainState: params/EMA/adam moments follow the param
    sharding; step + rng stay replicated."""
    p_sh = fsdp_sharding(state.params, mesh, axis, min_size)

    def match(tree):
        """Apply param shardings to any pytree with param-shaped leaves."""
        flat_p, treedef_p = jax.tree.flatten(p_sh)

        def leaf_sharding(x):
            return NamedSharding(
                mesh, _spec_for(x.shape, mesh.shape[axis], min_size))

        return jax.tree.map(lambda x: jax.device_put(x, leaf_sharding(x)),
                            tree)

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
        params=jax.device_put(state.params, p_sh),
        ema_params=jax.device_put(state.ema_params, p_sh),
        opt_state=match(state.opt_state),
    )
