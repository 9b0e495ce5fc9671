"""Exponential moving average of parameters, as a pure pytree transform.

Reference semantics (trainers/ema.py:36-44 + trainer_ddpm.py:107-111):
- before ``start_step`` the EMA is reset to the raw params every step;
- afterwards it lerps ``ema*decay + (1-decay)*params`` every
  ``update_every`` steps, otherwise stays unchanged.

Runs entirely inside the jitted train step — the shadow params never
leave the device.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(
    ema_params: Any,
    params: Any,
    step: jnp.ndarray,
    decay: float,
    start_step: int = 2000,
    update_every: int = 10,
) -> Any:
    """One EMA step. `step` is the (0-based) optimizer step just taken."""
    is_warmup = step < start_step
    do_update = (step % update_every) == 0

    def leaf(e, p):
        lerped = e * decay + (1.0 - decay) * p
        kept = jnp.where(do_update, lerped, e)
        return jnp.where(is_warmup, p, kept)

    return jax.tree.map(leaf, ema_params, params)
