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
import jax.numpy as jnp
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
                      ddim_eta: float = 0.0,
                      chain_segments: int = 1) -> Callable:
    """Jitted sampler with the output batch sharded over the mesh.

    ddim_steps selects the strided DDIM sampler instead of the full
    ancestral chain.

    chain_segments > 1 splits the ancestral reverse chain into that
    many consecutive jitted scans (one compiled program reused with a
    different ts operand — ts is a traced scan input, so segments share
    one executable).  BIT-IDENTICAL to the monolithic chain: per-step
    noise is keyed fold_in(rng, t) off one post-split rng either way.
    Needed on axon because the tunnel kills any single device program
    over ~45-65 s wall-clock (measured, BENCH_NOTES r4) — the 1000-step
    chain at bs > 96 crosses it; segments of <= ~500 steps do not.
    """
    sharding = NamedSharding(mesh, P("data"))
    is_downsampled = isinstance(process, DownsampleDiffusion)
    out_sh = (sharding, sharding) if is_downsampled else sharding

    if chain_segments <= 1 or ddim_steps is not None:
        @partial(jax.jit, out_shardings=out_sh)
        def sampler(params, rng):
            if ddim_steps is not None:
                return process.ddim_sample(params, rng, batch_size,
                                           ddim_steps, ddim_eta)
            return process.sample(params, rng, batch_size,
                                  early_stop=early_stop)

        return sampler

    t_end = 0 if early_stop is None else early_stop
    ts_full = np.arange(process.timesteps - 1, t_end - 1, -1,
                        dtype=np.int32)
    # EQUAL segment lengths keep jit specialized on ONE ts shape, so all
    # segments truly share a single compiled executable (the chain
    # compile is minutes).  If chain_segments does not divide the chain,
    # prefer the smallest divisor in [K, 2K] (more, shorter segments —
    # still under the duration wall); only a pathological length (e.g.
    # a prime early_stop remainder) falls back to unequal linspace
    # bounds, which compiles exactly two shapes (len L and L+1).
    n = len(ts_full)
    k = next((kk for kk in range(chain_segments, 2 * chain_segments + 1)
              if n % kk == 0), None)
    if k is not None:
        ts_segments = list(ts_full.reshape(k, n // k))
    else:
        bounds = np.linspace(0, n, chain_segments + 1).astype(int)
        ts_segments = [ts_full[a:b] for a, b in zip(bounds[:-1], bounds[1:])
                       if b > a]

    @partial(jax.jit, out_shardings=sharding)
    def init_latent(rng):
        init_rng = jax.random.split(rng)[1]
        return jax.random.normal(
            init_rng, (batch_size, *process.sample_shape), jnp.float32)

    @partial(jax.jit, out_shardings=sharding, donate_argnums=2)
    def run_segment(params, rng, img, ts):
        chain_rng = jax.random.split(rng)[0]
        return process.p_sample_chain(params, chain_rng, img, ts)

    @partial(jax.jit, out_shardings=out_sh)
    def finalize(params, z):
        if is_downsampled:
            return process.rescaled_upsample(params, z), z
        return z

    def sampler(params, rng):
        img = init_latent(rng)
        for ts in ts_segments:
            img = run_segment(params, rng, img, jnp.asarray(ts))
        return finalize(params, img)

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
    chain_segments: int = 1,
) -> Tuple[np.ndarray, Optional[np.ndarray], Dict[str, float]]:
    """Generate >= fid_samples images; returns (samples, latents, timing).

    Output arrays have shape (n_batches, B, H, W, C) scaled to [0, 255],
    byte-compatible with the reference's npy sample batches.
    """
    sampler = make_bulk_sampler(process, mesh, batch_size, early_stop,
                                ddim_steps, ddim_eta, chain_segments)
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
