"""Calibration for the opt-in int8 (W8A8) conv serving mode.

ops/quant.py quantizes gated conv sites with STATIC per-tensor
activation scales held in the flax "quant" collection.  This module
populates that collection for a trained model:

  1. run a small bf16 reverse chain (a twin model built with
     conv_quant unset — same params) and snapshot the latent state at
     `n_points` evenly spaced timesteps;
  2. run the QUANTIZED net's eps-predictor on each (x_t, t) snapshot
     with mutable=["quant"]: every gated conv site records the running
     absmax of its input (ops/quant.py observed_amax).

The bf16 trajectory matters: calibrating on a quantized chain before
scales exist would observe garbage activations.  Max-calibration over
a spread of timesteps covers the chain's activation-range drift (early
steps are near-N(0,1); late steps approach the data manifold).

`mode="noise"` skips the trajectory and calibrates on N(0,1) latents
only — sufficient when only the compiled graph matters (throughput
benches) or as a cheap bootstrap; quality-bearing runs use the default
trajectory mode.

No reference equivalent (the reference has no quantized mode); this is
a TPU-native serving extension, opt-in via --quant-conv int8.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _eps_method(net):
    """The eps-predictor apply method for plain UNet vs composite nets."""
    return getattr(type(net), "eps", None)


def calibrate_conv_quant(config: dict, net, process, variables: dict,
                         rng, batch_size: int = 8, n_points: int = 16,
                         mode: str = "trajectory") -> dict:
    """Returns `variables` with a calibrated "quant" collection.

    `net`/`process` are the QUANTIZED model (built with
    config["conv_quant"]="int8"); `variables` holds at least "params".
    """
    if config.get("conv_quant") not in ("int8",):
        return variables
    params_only = {"params": variables["params"]}
    t_max = int(process.timesteps) - 1

    snapshots = []  # (x_t latent batch, t) pairs
    lat_shape = (batch_size, *process.sample_shape)
    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, lat_shape, jnp.float32)
    snapshots.append((x_init, t_max))

    if mode == "trajectory":
        # bf16 twin: same params, quant mode off
        from dddpm_tpu.models.factory import build_model

        cfg_b = dict(config)
        cfg_b.pop("conv_quant", None)
        _, proc_b, _, _ = build_model(cfg_b)
        every = max(1, (t_max + 1) // max(1, n_points))
        chain_rng = jax.random.split(rng)[0]
        ts = jnp.arange(t_max, -1, -1, dtype=jnp.int32)
        _, snaps = jax.jit(proc_b.p_sample_chain_snapshots,
                           static_argnames="every")(
            params_only, chain_rng, x_init, ts, every=every)
        # snapshot i is the state after the chunk ending at chunk_ts[-1],
        # i.e. x_{t-1}, consumed by the eps net at t-1 (skip t-1 < 0)
        n = len(ts)
        rem = n % every
        chunk_last_t = np.asarray(ts)[rem:].reshape(-1, every)[:, -1]
        snaps = jax.device_get(snaps)
        for img, t_last in zip(snaps, chunk_last_t):
            if int(t_last) - 1 >= 0:
                snapshots.append((jnp.asarray(img), int(t_last) - 1))
    else:
        # noise-only: spread t over the chain on fresh N(0,1) latents
        for i, t in enumerate(np.linspace(0, t_max, max(2, n_points),
                                          dtype=np.int64)):
            rng, r = jax.random.split(rng)
            snapshots.append(
                (jax.random.normal(r, lat_shape, jnp.float32), int(t)))

    method = _eps_method(net)
    quant = variables.get("quant", None)

    @jax.jit
    def observe(quant_coll, x_t, t_b):
        vs = dict(params_only)
        if quant_coll is not None:
            vs["quant"] = quant_coll
        kwargs = {} if method is None else {"method": method}
        _, upd = net.apply(vs, x_t, t_b, mutable=["quant"], **kwargs)
        return upd["quant"]

    for x_t, t in snapshots:
        t_b = jnp.full((x_t.shape[0],), t, jnp.int32)
        quant = observe(quant, x_t, t_b)
        # jit caches on the pytree structure; after the first call the
        # collection exists and the second trace (quant != None) is the
        # steady state
    out = dict(variables)
    out["quant"] = quant
    return out


def maybe_calibrate(config: dict, net, process, variables: dict, rng,
                    batch_size: Optional[int] = None,
                    mode: str = "trajectory") -> dict:
    """Calibrate iff config enables conv quantization and no calibrated
    "quant" collection is already present (e.g. restored from disk)."""
    if config.get("conv_quant") not in ("int8",):
        return variables
    if "quant" in variables and any(
            float(v) > 0.0 for v in
            jax.tree_util.tree_leaves(variables["quant"])):
        return variables
    return calibrate_conv_quant(config, net, process, variables, rng,
                                batch_size=batch_size or 4, mode=mode)
