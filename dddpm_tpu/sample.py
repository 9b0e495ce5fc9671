"""Bulk sampling for FID: device-parallel batched generation.

Reference generate_model_samples.py:44-58 loops ceil(50000/192) batches
of model.sample(192) with host-side timing.  TPU-native version: one
jitted program whose 1000-step reverse chain is a lax.scan, with the
batch sharded over the 'data' mesh axis so every chip generates an
independent shard of the batch (per-device PRNG folds come free from
sharded jax.random.normal under jit).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dddpm_tpu.models.dddpm import DownsampleDiffusion
from dddpm_tpu.ops.math import min_max_norm_image


def fix_samples(samples) -> np.ndarray:
    """Per-image min-max -> x255, NHWC numpy (reference
    utils/eval_helpers.py:37-41; ours is natively NHWC)."""
    return np.asarray(min_max_norm_image(samples) * 255.0)


def make_bulk_sampler(process, mesh: Mesh, batch_size: int,
                      early_stop: Optional[int] = None,
                      ddim_steps: Optional[int] = None,
                      ddim_eta: float = 0.0) -> Callable:
    """Jitted sampler with the output batch sharded over the mesh.

    ddim_steps selects the strided DDIM sampler instead of the full
    ancestral chain.
    """
    sharding = NamedSharding(mesh, P("data"))
    is_downsampled = isinstance(process, DownsampleDiffusion)
    out_sh = (sharding, sharding) if is_downsampled else sharding

    @partial(jax.jit, out_shardings=out_sh)
    def sampler(params, rng):
        if ddim_steps is not None:
            return process.ddim_sample(params, rng, batch_size,
                                       ddim_steps, ddim_eta)
        return process.sample(params, rng, batch_size, early_stop)

    return sampler


def generate_samples(
    process,
    params,
    mesh: Mesh,
    rng,
    fid_samples: int = 50000,
    batch_size: int = 192,
    early_stop: Optional[int] = None,
    ddim_steps: Optional[int] = None,
    ddim_eta: float = 0.0,
    progress: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray], Dict[str, float]]:
    """Generate >= fid_samples images; returns (samples, latents, timing).

    Output arrays have shape (n_batches, B, H, W, C) scaled to [0, 255],
    byte-compatible with the reference's npy sample batches.
    """
    sampler = make_bulk_sampler(process, mesh, batch_size, early_stop,
                                ddim_steps, ddim_eta)
    is_downsampled = isinstance(process, DownsampleDiffusion)
    n_batches = int(np.ceil(fid_samples / batch_size))

    sample_list, latent_list = [], []
    start = time.time()
    for i in range(n_batches):
        out = sampler(params, jax.random.fold_in(rng, i))
        if is_downsampled:
            x_s, z_s = out
            sample_list.append(fix_samples(x_s))
            latent_list.append(fix_samples(z_s))
        else:
            sample_list.append(fix_samples(out))
        if progress:
            print(f"sampling batch {i + 1}/{n_batches}", flush=True)
    total = time.time() - start

    timing = {
        "total_s": total,
        "per_sample_s": total / fid_samples,
        "per_batch_s": total / n_batches,
        "imgs_per_sec": (n_batches * batch_size) / total,
    }
    samples = np.stack(sample_list)
    latents = np.stack(latent_list) if latent_list else None
    return samples, latents, timing
