"""Downsampled DDPM: the diffusion chain runs in a conv-downsampled
latent space, with learned down/upsample networks around it.

Behavioural parity with /root/reference/models/diffusion/dddpm.py:
- rescaled_downsample / rescaled_upsample with optional tanh squash
  (force_latent);
- recon loss gated to timesteps t < t_rec_max;
- the default autoencoder variant computes the recon loss from z
  directly and stops the gradient of z before the DDPM loss
  (dddpm.py:155-177);
- sample()/reconstruct() return both image- and latent-space tensors.

This is the whole 29-266x sampling speedup: T UNet evaluations run at
(H/2^n)^2 spatial size, followed by a single upsample.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dddpm_tpu.models.ddpm import GaussianDiffusion
from dddpm_tpu.models.schedule import DiffusionSchedule
from dddpm_tpu.ops import math as dmath


def recon_capacity(batch: int, p: float) -> int:
    """Static sub-batch capacity for the gather-compacted recon branch.

    The recon loss is zero (value AND gradient) wherever t >= t_rec_max
    (reference dddpm.py:119), so on average only p = t_rec_max/T of a
    batch feeds the resampler gradients.  Capacity = mean + 4 sd + 1,
    rounded up to a multiple of 4 (sublane-friendly).  Overflow — a
    ~3e-5/step event at the reference recipe (B=32, p=0.1, cap 12) —
    falls back to the exact dense branch via lax.cond, so this bound is
    a performance knob, never a correctness one.

    p is clamped to [0, 1]: CLI overrides can produce t_rec_max > T
    (e.g. --T 50 with the default t_rec_max=100), where the gate is
    always open and the dense path is correct (p=1 -> cap=batch, and
    the caller's `cap < batch` check routes to the dense branch).
    """
    p = min(1.0, max(0.0, p))
    cap = batch * p + 4.0 * math.sqrt(batch * p * (1.0 - p)) + 1.0
    cap = int(math.ceil(cap / 4.0)) * 4
    return min(batch, max(4, cap))


class DownsampleDiffusion(GaussianDiffusion):
    """dDDPM: DDPM in z-space + down/up sampler networks.

    Args (beyond GaussianDiffusion):
      down_fn: (params, x, rng, train) -> z (pre-squash).
      up_fn:   (params, z, rng, train) -> x (pre-squash).
      x_shape: (H, W, C) of image space.
      sample_shape: (H/2^n, W/2^n, unet_in) of latent space.
      t_rec_max: recon loss only applies where t < t_rec_max (-1 -> T-1).
      force_latent: tanh-squash both spaces into [-1, 1].
      recon_compact: gather-compacted recon branch (autoencoder variant
        only).  PRECONDITION: both resamplers must be deterministic
        (d_dropout == 0) — the compact and dense branches evaluate the
        resamplers on different batch shapes, so stochastic layers
        (dropout) would draw different masks and the lax.cond overflow
        fallback would silently change training behavior.  The factory
        (`models/factory.py`) enforces this gate; direct constructors
        must honor it themselves.
    """

    def __init__(
        self,
        schedule: DiffusionSchedule,
        eps_fn: Callable,
        down_fn: Callable,
        up_fn: Callable,
        x_shape: Tuple[int, int, int],
        sample_shape: Tuple[int, int, int],
        loss_type: str = "simple",
        loss_flat: str = "sum",
        t_rec_max: int = 100,
        force_latent: bool = True,
        recon_compact: bool = False,
    ):
        super().__init__(schedule, eps_fn, sample_shape, loss_type, loss_flat)
        self.down_fn = down_fn
        self.up_fn = up_fn
        self.x_shape = tuple(x_shape)
        self.t_rec_max = int(self.timesteps - 1) if t_rec_max == -1 else t_rec_max
        self.force_latent = force_latent
        # gather-compacted recon branch (autoencoder variant only; see
        # DownsampleDiffusionAutoencoder.losses)
        self.recon_compact = recon_compact

    # ------------------------------------------------------------- resample

    def rescaled_downsample(self, params, x, rng=None, train: bool = False):
        z = self.down_fn(params, x, rng, train)
        assert z.shape[1:] == self.sample_shape, (z.shape, self.sample_shape)
        if self.force_latent:
            z = jnp.tanh(z)
        return z

    def rescaled_upsample(self, params, z, rng=None, train: bool = False):
        x = self.up_fn(params, z, rng, train)
        assert x.shape[1:] == self.x_shape, (x.shape, self.x_shape)
        if self.force_latent:
            x = jnp.tanh(x)
        return x

    # ------------------------------------------------------------- sampling

    def sample(self, params, rng, batch_size: int = 16,
               every: Optional[int] = None,
               early_stop: Optional[int] = None):
        """Latent-space reverse chain, then one upsample to image space.

        With `every=k`, returns (x_sample, z_sample, z_snapshots) where
        z_snapshots stacks the LATENT chain state after each k reverse
        steps (snapshots stay in z-space: decoding every intermediate
        through the upsampler would multiply the output bytes by the
        spatial factor for a visualization-only artifact)."""
        if every is None:
            z_sample = self.p_sample_loop(
                params, rng, (batch_size, *self.sample_shape), early_stop
            )
            x_sample = self.rescaled_upsample(params, z_sample)
            return x_sample, z_sample
        z_sample, z_snapshots = self.p_sample_loop(
            params, rng, (batch_size, *self.sample_shape), early_stop, every
        )
        x_sample = self.rescaled_upsample(params, z_sample)
        return x_sample, z_sample, z_snapshots

    def ddim_sample(self, params, rng, batch_size: int = 16,
                    num_steps: int = 50, eta: float = 0.0,
                    spacing: str = "linear"):
        """Strided DDIM chain in latent space, then one upsample."""
        z_sample = self.ddim_sample_loop(
            params, rng, (batch_size, *self.sample_shape), num_steps, eta,
            spacing)
        x_sample = self.rescaled_upsample(params, z_sample)
        return x_sample, z_sample

    def reconstruct(self, params, rng, x, n: int):
        """(x_recon, z_recon) at n linearly spaced noise scales."""
        x = x[:n]
        t = jnp.linspace(0, self.timesteps - 1, n).astype(jnp.int32)
        z = self.rescaled_downsample(params, x)
        eps = jax.random.normal(rng, z.shape, z.dtype)
        z_t = self.q_sample(z, t, eps)
        eps_hat = self.eps_fn(params, z_t, t, None, False)
        z_recon = self.predict_x_from_eps(z_t, t, eps_hat, clip=False)
        x_recon = self.rescaled_upsample(params, z_recon)
        return x_recon, z_recon

    # --------------------------------------------------------------- losses

    def loss_recon(self, params, x, z_hat, t, rng=None, train: bool = False):
        """Per-element image reconstruction loss, gated to t < t_rec_max."""
        x_hat = self.rescaled_upsample(params, z_hat, rng, train)
        loss = self.flatten_loss(dmath.l2_loss(x, x_hat))
        return jnp.where(t < self.t_rec_max, loss, jnp.zeros_like(loss))

    def losses(self, params, rng, x, t, train: bool = True):
        """Joint objective: latent DDPM loss + gated recon loss."""
        rng_eps, rng_d, rng_u, rng_unet = jax.random.split(rng, 4)
        z = self.rescaled_downsample(params, x, rng_d, train)

        eps = jax.random.normal(rng_eps, z.shape, z.dtype)
        z_t = self.q_sample(z, t, eps)
        eps_hat = self.eps_fn(params, z_t, t, rng_unet, train)
        l_ddpm = self.loss_ddpm(eps, eps_hat, t)

        z_hat = self.predict_x_from_eps(z_t, t, eps_hat, clip=False)
        l_rec = self.loss_recon(params, x, z_hat, t, rng_u, train)

        obj = l_ddpm + l_rec.mean()
        return obj, {"latent": l_ddpm, "recon": l_rec.mean()}

    def loss_fn(self, params, rng, x, train: bool = True):
        rng_t, rng_l = jax.random.split(rng)
        t = self.t_sample(rng_t, x.shape[0])
        obj, parts = self.losses(params, rng_l, x, t, train)
        return obj, {"train_obj": obj, "train_latent": parts["latent"],
                     "train_recon": parts["recon"]}

    def test_losses(self, params, rng, x) -> Dict[str, jnp.ndarray]:
        """Full-chain VLB computed in z-space (reference dddpm.py:145-148)."""
        z = self.rescaled_downsample(params, x)
        return super().test_losses(params, rng, z)


class DownsampleDiffusionAutoencoder(DownsampleDiffusion):
    """Default dDDPM variant: recon loss as a pure autoencoder pass,
    z detached before the DDPM loss (reference dddpm.py:151-177).

    With recon_compact=True the recon branch — the ONLY gradient source
    for both resamplers, since z is detached before the DDPM loss — is
    computed on a gather-compacted sub-batch of the t < t_rec_max
    samples (capacity from `recon_capacity`), because the t-gate zeroes
    ~90% of the batch's recon values and gradients at the reference
    recipe (t_rec_max=100, T=1000).  The resampler forward+backward then
    runs at capacity/B of the dense cost; the full-batch downsample that
    feeds the (detached) DDPM loss stays forward-only.  A lax.cond
    fallback to the dense branch keeps the objective exact when the
    masked count overflows the capacity.
    """

    def losses(self, params, rng, x, t, train: bool = True):
        batch = x.shape[0]
        cap = None
        if self.recon_compact:
            c = recon_capacity(batch, self.t_rec_max / self.timesteps)
            if c < batch:
                cap = c
        if cap is None:
            return self._losses_dense(params, rng, x, t, train)

        # identical rng layout to the dense branch: the DDPM leg (eps /
        # unet dropout) is bit-identical either way
        rng_eps, rng_d, rng_u, rng_unet = jax.random.split(rng, 4)

        mask = t < self.t_rec_max
        # masked samples first, original order preserved (stable sort)
        idx = jnp.argsort(jnp.where(mask, 0, 1), stable=True)[:cap]
        count = jnp.sum(mask)

        def _compact(_):
            x_sub = jnp.take(x, idx, axis=0)
            t_sub = jnp.take(t, idx, axis=0)
            z_sub = self.rescaled_downsample(params, x_sub, rng_d, train)
            l_sub = self.loss_recon(params, x_sub, z_sub, t_sub, rng_u, train)
            # unmasked fill-ins (count < cap) have t_sub >= t_rec_max and
            # are zeroed by loss_recon's gate; sum/B == dense mean
            return jnp.sum(l_sub) / batch

        def _dense(_):
            z_full = self.rescaled_downsample(params, x, rng_d, train)
            l_full = self.loss_recon(params, x, z_full, t, rng_u, train)
            return jnp.sum(l_full) / batch

        l_rec_mean = lax.cond(count <= cap, _compact, _dense, None)

        # DDPM loss on detached latents: full-batch forward, no backward
        z = lax.stop_gradient(self.rescaled_downsample(params, x, rng_d, train))
        eps = jax.random.normal(rng_eps, z.shape, z.dtype)
        z_t = self.q_sample(z, t, eps)
        eps_hat = self.eps_fn(params, z_t, t, rng_unet, train)
        l_ddpm = self.loss_ddpm(eps, eps_hat, t)

        obj = l_ddpm + l_rec_mean
        return obj, {"latent": l_ddpm, "recon": l_rec_mean}

    def _losses_dense(self, params, rng, x, t, train: bool = True):
        rng_eps, rng_d, rng_u, rng_unet = jax.random.split(rng, 4)
        z = self.rescaled_downsample(params, x, rng_d, train)

        # autoencoder reconstruction straight from z
        l_rec = self.loss_recon(params, x, z, t, rng_u, train)

        # DDPM loss on detached latents
        z = lax.stop_gradient(z)
        eps = jax.random.normal(rng_eps, z.shape, z.dtype)
        z_t = self.q_sample(z, t, eps)
        eps_hat = self.eps_fn(params, z_t, t, rng_unet, train)
        l_ddpm = self.loss_ddpm(eps, eps_hat, t)

        obj = l_ddpm + l_rec.mean()
        return obj, {"latent": l_ddpm, "recon": l_rec.mean()}
