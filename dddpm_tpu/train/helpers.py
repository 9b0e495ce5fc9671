"""Training helpers (reference trainers/train_helpers.py parity).

``cycle`` lives on the Loader; the remaining helpers — batch grouping,
LR lambdas, deterministic KL warmup, BCE — are provided for the
VAE-family trainers the config system still describes.
"""
from __future__ import annotations

import os
from typing import List

import jax.numpy as jnp


def num_to_groups(num: int, divisor: int) -> List[int]:
    """Split num into groups of divisor (+ remainder group)."""
    groups = num // divisor
    remainder = num % divisor
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr


def lambda_lr(n_epochs: int, offset: int, delay: int):
    """Linear LR decay schedule starting after `delay` epochs."""
    if (n_epochs - delay) <= 0:
        raise ValueError("Decay must start before training ends")

    def schedule(epoch: int) -> float:
        return 1.0 - max(0.0, epoch + offset - delay) / (n_epochs - delay)

    return schedule


class DeterministicWarmup:
    """Linear KL-weight warmup from 0 to t_max over n steps."""

    def __init__(self, n: int = 100, t_max: float = 1.0):
        self.t = 0.0
        self.t_max = t_max
        self.inc = 1.0 / n

    def __iter__(self):
        return self

    def __next__(self) -> float:
        self.t = min(self.t + self.inc, self.t_max)
        return self.t


def bce_loss(r: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli reconstruction log-likelihood summed per element."""
    eps = 1e-7
    r = jnp.clip(r, eps, 1.0 - eps)
    ll = x * jnp.log(r) + (1.0 - x) * jnp.log(1.0 - r)
    return -ll.reshape(x.shape[0], -1).sum(-1)


def delete_if_exists(path: str):
    if os.path.exists(path):
        os.remove(path)
