"""Eval helpers (reference utils/eval_helpers.py).

- generator_batches: eval-transformed loader -> [0,255] NHWC numpy
- compute_test_losses: mean full-chain VLB (bits/dim) + L_simple over a
  test loader (reference eval_helpers.py:24-34)
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def generator_batches(loader) -> Iterator[np.ndarray]:
    """Yield [0,255] NHWC numpy batches from a [0,1] eval loader
    (reference create_generator_loader; ours is natively NHWC)."""
    for batch in loader:
        x = batch[0] if isinstance(batch, tuple) else batch
        yield np.asarray(x, np.float32) * 255.0


def compute_test_losses(process, params, rng, test_loader,
                        max_batches: int = None) -> Tuple[float, float]:
    """Mean full-chain VLB + summed L_simple over the test set."""
    test_fn = jax.jit(lambda p, r, x: process.test_losses(p, r, x))
    vlbs, l_simples = [], []
    for i, (x, _) in enumerate(test_loader):
        if max_batches is not None and i >= max_batches:
            break
        out = test_fn(params, jax.random.fold_in(rng, i), jnp.asarray(x))
        vlbs.append(np.asarray(out["vlb"]))
        l_simples.append(float(out["L_simple"]))
    vlb = float(np.concatenate(vlbs).mean())
    l_simple = float(np.mean(l_simples))
    return vlb, l_simple
