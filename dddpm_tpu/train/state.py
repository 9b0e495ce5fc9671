"""Train state and the jitted training step.

The reference's hot loop (trainers/trainer_ddpm.py:113-158) does, per
step: 2 grad-accumulation micro-batches with a host sync each
(`obj.item()`), grad-clip 1.0, Adam, EMA.  Here the WHOLE step —
micro-batch scan, gradient mean, clip, Adam update, EMA lerp — is one
jitted, donated program; metrics come back as device scalars that the
host only materializes when flushing logs.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import lax

from dddpm_tpu.train.ema import ema_update


@struct.dataclass
class TrainState:
    """All mutable training state, donated through the train step."""

    step: jnp.ndarray            # scalar int32, 0-based
    params: Any
    ema_params: Any
    opt_state: Any
    rng: jax.Array               # base PRNG key, folded with step


def create_optimizer(lr: float, clip_norm: float = 1.0) -> optax.GradientTransformation:
    """Global-norm clip 1.0 then Adam — reference trainer_ddpm.py:142-143
    + trainer.py:69 (torch Adam defaults: b1=0.9 b2=0.999 eps=1e-8)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def create_train_state(config: Dict, init_fn: Callable, rng: jax.Array,
                       tx: optax.GradientTransformation) -> TrainState:
    rng, init_rng = jax.random.split(rng)
    params = init_fn(init_rng)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        rng=rng,
    )


def make_train_step(
    process,
    tx: optax.GradientTransformation,
    grad_accum: int = 2,
    ema_decay: float = 0.995,
    ema_start: int = 2000,
    ema_every: int = 10,
) -> Callable[[TrainState, jnp.ndarray], Tuple[TrainState, Dict]]:
    """Build the pure train step.

    batch has shape (grad_accum, B, H, W, C); the micro-batch loop is a
    lax.scan so the compiled program is identical for any accum factor.
    """
    use_ema = ema_decay > 0

    def loss(params, rng, x):
        return process.loss_fn(params, rng, x, True)

    grad_fn = jax.value_and_grad(loss, has_aux=True)

    def train_step(state: TrainState, batch: jnp.ndarray):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def micro(grads_acc, inp):
            i, xb = inp
            (obj, metrics), grads = grad_fn(
                state.params, jax.random.fold_in(step_rng, i), xb
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return grads_acc, metrics

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        idx = jnp.arange(grad_accum)
        grads, metrics = lax.scan(micro, zero_grads, (idx, batch))
        grads = jax.tree.map(lambda g: g / grad_accum, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if use_ema:
            ema_params = ema_update(
                state.ema_params, params, state.step, ema_decay,
                ema_start, ema_every,
            )
        else:
            ema_params = state.ema_params

        metrics = jax.tree.map(lambda m: m.mean(), metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step
