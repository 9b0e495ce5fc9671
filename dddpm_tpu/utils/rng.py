"""Deterministic seeding (reference utils/rnd_seed.py:7-17, minus the
torch/cuda parts — JAX RNG is explicit so only host-side RNGs and the
base PRNG key need seeding)."""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np
import jax


def seed_everything(seed: Optional[int]) -> Optional[jax.Array]:
    """Seed python/numpy and return the base JAX PRNG key.

    No-op (returns a time-derived key) if seed is None, matching the
    reference's behaviour of skipping seeding entirely.
    """
    if seed is None:
        return jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**31))
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
