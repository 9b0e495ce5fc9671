"""Gaussian diffusion (DDPM) as pure jittable functions.

Behavioural parity with /root/reference/models/diffusion/ddpm.py, built
TPU-first:

- all q/p math is pure functions over a DiffusionSchedule pytree;
- the T-step ancestral sampling chain (reference p_sample_loop's Python
  loop, ddpm.py:229-249) is a single ``jax.lax.scan`` inside one jitted
  program — no per-step host round trips, per-step noise from
  ``jax.random.fold_in``;
- the full-chain VLB evaluation (reference test_losses_, ddpm.py:391-442)
  is likewise one scan over t.

The class itself is static configuration (hashable, closed over by jit);
parameters and rng are always explicit arguments.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dddpm_tpu.models.schedule import DiffusionSchedule, gather
from dddpm_tpu.ops import math as dmath

OBJECTIVE_NAMES = ("simple", "hybrid", "vlb")


class GaussianDiffusion:
    """DDPM forward/reverse process around an eps-predictor network.

    Args:
      schedule: precomputed DiffusionSchedule.
      eps_fn: callable (params, x_t, t, rng, train) -> eps_hat. The rng
        is only consumed for dropout when train=True.
      sample_shape: (H, W, C) of the diffused space (latent space for
        dDDPM, image space for plain DDPM).
      loss_type: 'simple' | 'vlb' | 'hybrid'.
      loss_flat: 'sum' | 'mean' flattening of the per-pixel L2.
    """

    lambda_ = 1e-4
    clip_range = (-1.0, 1.0)

    def __init__(
        self,
        schedule: DiffusionSchedule,
        eps_fn: Callable,
        sample_shape: Tuple[int, int, int],
        loss_type: str = "simple",
        loss_flat: str = "sum",
    ):
        assert loss_type in OBJECTIVE_NAMES
        assert loss_flat in ("sum", "mean")
        self.schedule = schedule
        self.eps_fn = eps_fn
        self.sample_shape = tuple(sample_shape)
        self.timesteps = schedule.timesteps
        self.loss_type = loss_type
        self.flatten_loss = dmath.reduce_sum if loss_flat == "sum" else dmath.reduce_mean

    # ---------------------------------------------------------------- q / p

    def q_mean_variance(self, x, t):
        """q(x_t | x_0): mean, variance, log-variance."""
        s = self.schedule
        mean = gather(s.sqrt_alphas_cumprod, t, x.ndim) * x
        variance = gather(1.0 - s.alphas_cumprod, t, x.ndim)
        log_variance = gather(s.log_one_minus_alphas_cumprod, t, x.ndim)
        return mean, variance, log_variance

    def q_sample(self, x, t, eps):
        """Forward-noise x to step t: sqrt(ab_t) x + sqrt(1-ab_t) eps."""
        s = self.schedule
        return (
            gather(s.sqrt_alphas_cumprod, t, x.ndim) * x
            + gather(s.sqrt_one_minus_alphas_cumprod, t, x.ndim) * eps
        )

    def predict_x_from_eps(self, x_t, t, eps, clip: bool = True):
        """Invert q_sample: x_0 = sqrt(1/ab_t) x_t - sqrt(1/ab_t - 1) eps."""
        s = self.schedule
        x = (
            gather(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - gather(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )
        if clip:
            x = jnp.clip(x, *self.clip_range)
        return x

    def q_posterior(self, x, x_t, t):
        """q(x_{t-1} | x_t, x_0): mean, variance, clipped log-variance."""
        s = self.schedule
        mean = (
            gather(s.posterior_mean_coef1, t, x_t.ndim) * x
            + gather(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = gather(s.posterior_variance, t, x_t.ndim)
        log_variance = gather(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    def p_mean_variance(self, params, x_t, t):
        """p(x_{t-1} | x_t) via the eps-predictor, x_0 clipped to [-1, 1]."""
        eps_hat = self.eps_fn(params, x_t, t, None, False)
        x_recon = self.predict_x_from_eps(x_t, t, eps_hat, clip=True)
        return self.q_posterior(x_recon, x_t, t)

    # ------------------------------------------------------------- sampling

    def p_sample(self, params, rng, x_t, t):
        """One ancestral step; noise is masked out at t == 0."""
        mean, _, log_variance = self.p_mean_variance(params, x_t, t)
        eps = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (t.shape[0],) + (1,) * (x_t.ndim - 1)
        )
        return mean + nonzero * jnp.exp(0.5 * log_variance) * eps

    def p_sample_chain(self, params, rng, img, ts):
        """Scan p_sample over an explicit (descending) t array.

        The segmentable core of p_sample_loop: per-step noise is keyed
        fold_in(rng, t), so running the chain as several consecutive
        calls over slices of the same ts array (same post-split rng) is
        BIT-IDENTICAL to one monolithic scan.  Segmentation exists
        because the axon tunnel kills any single device program longer
        than ~45-65 s wall-clock (measured bisection, BENCH_NOTES r4) —
        the full 1000-step chain at bs > 96 crosses that wall."""
        def step(img, t):
            t_b = jnp.full((img.shape[0],), t, dtype=jnp.int32)
            img = self.p_sample(params, jax.random.fold_in(rng, t), img, t_b)
            return img, None

        img, _ = lax.scan(step, img, ts)
        return img

    def p_sample_chain_snapshots(self, params, rng, img, ts, every: int):
        """p_sample_chain that also returns the chain state after every
        `every` steps (stacked along a leading axis, oldest first).

        Because per-step noise is keyed fold_in(rng, t) (see
        p_sample_chain), the final state is BIT-identical to the
        snapshot-free chain over the same ts. A non-divisible remainder
        is run first so snapshots land on the trailing (low-t) steps.
        """
        n = int(ts.shape[0])
        if every <= 0:
            raise ValueError(f"every must be positive, got {every}")
        if n == 0:  # empty chain (early_stop == T): no steps, no snapshots
            return img, jnp.zeros((0,) + img.shape, img.dtype)
        every = min(every, n)  # every > chain length -> one snapshot
        rem = n % every
        if rem:
            img = self.p_sample_chain(params, rng, img, ts[:rem])
        chunks = ts[rem:].reshape(-1, every)

        def step(img, ts_chunk):
            img = self.p_sample_chain(params, rng, img, ts_chunk)
            return img, img

        img, snapshots = lax.scan(step, img, chunks)
        return img, snapshots

    def p_sample_loop(self, params, rng, shape, early_stop: Optional[int] = None,
                      every: Optional[int] = None):
        """Full reverse chain T-1..t_end as ONE lax.scan under jit.

        `every=k` additionally returns intermediate chain states after
        each k steps — the reference's `sample(..., every)` argument
        (/root/reference/models/diffusion/ddpm.py:230,251) accepted this
        but never implemented it; here it is functional.
        """
        t_end = 0 if early_stop is None else early_stop
        rng, init_rng = jax.random.split(rng)
        img = jax.random.normal(init_rng, shape, jnp.float32)
        ts = jnp.arange(self.timesteps - 1, t_end - 1, -1, dtype=jnp.int32)
        if every is None:
            return self.p_sample_chain(params, rng, img, ts)
        return self.p_sample_chain_snapshots(params, rng, img, ts, every)

    def sample(self, params, rng, batch_size: int = 16,
               every: Optional[int] = None,
               early_stop: Optional[int] = None):
        """Sample a batch of images/latents from the model.

        With `every=k` returns (final, snapshots) where snapshots stacks
        the chain state after each k reverse steps."""
        return self.p_sample_loop(
            params, rng, (batch_size, *self.sample_shape), early_stop, every
        )

    def ddim_taus(self, num_steps: int, spacing: str = "linear"):
        """Descending tau subsequence. 'linear' spaces uniformly;
        'quad' concentrates steps near t=0 (DDIM paper's CIFAR
        schedule: linspace(0, sqrt(0.8 T), S)^2)."""
        import numpy as np

        if spacing == "linear":
            taus = np.linspace(0, self.timesteps - 1, num_steps)
        elif spacing == "quad":
            taus = np.linspace(0, np.sqrt(self.timesteps * 0.8),
                               num_steps) ** 2
        else:
            raise ValueError(f"unknown tau spacing '{spacing}'")
        taus = np.unique(taus.round().astype(np.int32))
        return jnp.asarray(taus[::-1].copy())

    def ddim_sample_loop(self, params, rng, shape, num_steps: int = 50,
                         eta: float = 0.0, spacing: str = "linear"):
        """DDIM sampling (Song et al.) over a strided t-subsequence.

        Beyond-parity extension: the reference accepts an (unused)
        `every` stride arg (ddpm.py:230) but never implements strided
        sampling; this is the TPU-native version — one lax.scan over
        the tau subsequence, deterministic when eta=0.

          x_prev = sqrt(ab_prev) x0 + sqrt(1 - ab_prev - sigma^2) eps
                   + sigma z
          sigma  = eta sqrt((1-ab_prev)/(1-ab)) sqrt(1 - ab/ab_prev)
        """
        s = self.schedule
        rng, init_rng = jax.random.split(rng)
        img = jax.random.normal(init_rng, shape, jnp.float32)

        taus = self.ddim_taus(num_steps, spacing)  # T-1 ... 0
        taus_prev = jnp.concatenate([taus[1:], jnp.array([-1], jnp.int32)])

        def step(img, tt):
            t, t_prev = tt
            t_b = jnp.full((shape[0],), t, dtype=jnp.int32)
            eps_hat = self.eps_fn(params, img, t_b, None, False)
            x0 = self.predict_x_from_eps(img, t_b, eps_hat, clip=True)

            ab = s.alphas_cumprod[t]
            ab_prev = jnp.where(t_prev < 0, 1.0, s.alphas_cumprod[t_prev])
            sigma = (eta
                     * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab))
                     * jnp.sqrt(1.0 - ab / ab_prev))
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0))
            noise = jax.random.normal(jax.random.fold_in(rng, t), shape,
                                      img.dtype)
            img = (jnp.sqrt(ab_prev) * x0 + dir_xt * eps_hat
                   + sigma * noise)
            return img, None

        img, _ = lax.scan(step, img, (taus, taus_prev))
        return img

    def ddim_sample(self, params, rng, batch_size: int = 16,
                    num_steps: int = 50, eta: float = 0.0,
                    spacing: str = "linear"):
        return self.ddim_sample_loop(
            params, rng, (batch_size, *self.sample_shape), num_steps, eta,
            spacing)

    def reconstruct(self, params, rng, x, n: int):
        """One-step denoised reconstructions at n linearly spaced t."""
        x = x[:n]
        t = jnp.linspace(0, self.timesteps - 1, n).astype(jnp.int32)
        eps = jax.random.normal(rng, x.shape, x.dtype)
        x_0 = self.q_sample(x, t, eps)
        eps_hat = self.eps_fn(params, x_0, t, None, False)
        return self.predict_x_from_eps(x_0, t, eps_hat, clip=False)

    # --------------------------------------------------------------- losses

    def loss_ddpm(self, eps, eps_hat, t):
        """Reduce the L2 noise-prediction error to the scalar objective."""
        loss = self.flatten_loss(dmath.l2_loss(eps, eps_hat))
        w = self.schedule.vlb_weights[t]
        if self.loss_type == "simple":
            return loss.mean()
        if self.loss_type == "vlb":
            return (w * loss).mean()
        # hybrid
        return (loss + self.lambda_ * w * loss).mean()

    def losses(self, params, rng, x, t, train: bool = True):
        """Single-step training objective at sampled timesteps t."""
        rng_eps, rng_drop = jax.random.split(rng)
        eps = jax.random.normal(rng_eps, x.shape, x.dtype)
        x_t = self.q_sample(x, t, eps)
        eps_hat = self.eps_fn(params, x_t, t, rng_drop, train)
        return self.loss_ddpm(eps, eps_hat, t)

    def t_sample(self, rng, n: int):
        """Uniform timesteps in [0, T)."""
        return jax.random.randint(rng, (n,), 0, self.timesteps, dtype=jnp.int32)

    def loss_fn(self, params, rng, x, train: bool = True):
        """Forward pass: sample t, return (objective, metrics)."""
        rng_t, rng_l = jax.random.split(rng)
        t = self.t_sample(rng_t, x.shape[0])
        obj = self.losses(params, rng_l, x, t, train)
        return obj, {"train_obj": obj}

    # ------------------------------------------------------------ VLB / NLL

    def vlb_terms(self, params, x, x_t, t, eps_hat=None):
        """L_t = KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)); L_0 = disc. NLL.

        Returns bits/dim per batch element; t==0 entries switch to NLL.
        """
        true_mean, _, true_log_var = self.q_posterior(x, x_t, t)
        if eps_hat is None:
            eps_hat = self.eps_fn(params, x_t, t, None, False)
        x_recon = self.predict_x_from_eps(x_t, t, eps_hat, clip=True)
        pred_mean, _, pred_log_var = self.q_posterior(x_recon, x_t, t)

        if self.loss_type == "hybrid":
            # vlb part only optimizes variances
            true_mean = lax.stop_gradient(true_mean)
            pred_mean = lax.stop_gradient(pred_mean)

        kl = dmath.normal_kl(true_mean, true_log_var, pred_mean, pred_log_var)
        kl = dmath.flat_bits(kl)

        nll = -dmath.discretized_gaussian_log_likelihood(
            x, means=pred_mean, log_scales=0.5 * pred_log_var
        )
        nll = dmath.flat_bits(nll)
        return jnp.where(t == 0, nll, kl)

    def calc_prior(self, x):
        """L_T = KL(q(x_T | x_0) || N(0, I)), bits/dim per element."""
        t = jnp.full((x.shape[0],), self.timesteps - 1, dtype=jnp.int32)
        mean, _, log_var = self.q_mean_variance(x, t)
        return dmath.flat_bits(dmath.normal_kl(mean, log_var, 0.0, 0.0))

    def test_losses(self, params, rng, x) -> Dict[str, jnp.ndarray]:
        """Full-chain VLB + L_simple over every t, as one lax.scan.

        The reference recomputes the UNet output twice per t
        (ddpm.py:414,418); we evaluate it once and reuse it — identical
        semantics in eval mode.
        """
        B = x.shape[0]

        def step(_, t):
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            eps = jax.random.normal(jax.random.fold_in(rng, t), x.shape, x.dtype)
            x_t = self.q_sample(x, t_b, eps)
            eps_hat = self.eps_fn(params, x_t, t_b, None, False)
            vlb = self.vlb_terms(params, x, x_t, t_b, eps_hat=eps_hat)
            l_simple = dmath.l2_loss(eps, eps_hat).mean()
            return None, (vlb, l_simple)

        ts = jnp.arange(self.timesteps - 1, -1, -1, dtype=jnp.int32)
        _, (vlb_t, l_simple_t) = lax.scan(step, None, ts)
        vlb_t = vlb_t.T  # (B, T) ordered t=T-1..0 like the reference stack
        prior = self.calc_prior(x)
        return {
            "vlb_t": vlb_t,
            "prior": prior,
            "vlb": vlb_t.sum(axis=1) + prior,
            "L_simple_t": l_simple_t,
            "L_simple": l_simple_t.sum(),
        }
