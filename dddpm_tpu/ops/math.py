"""Math primitives for diffusion losses and image utilities.

Behavioural parity targets (semantics only, reimplemented for JAX):
- normal_kl / approx cdf / discretized Gaussian NLL:
  /root/reference/models/utils/losses.py:17-109
- reduce_mean / reduce_sum / flat_bits / min-max norms:
  /root/reference/utils/utils.py:11-48
All functions are pure and jittable.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


@jax.custom_jvp
def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x)).

    Custom JVP: with t = tanh(softplus(x)) and s = sigmoid(x),
    mish'(x) = t + x * s * (1 - t^2) — the tangent shares t with the
    primal, so the backward pass costs 2 extra transcendentals instead
    of autodiff re-deriving the whole tanh/softplus chain (~17% of the
    dDDPM x3 256^2 train step is resampler mish).

    (A single-transcendental forward rewrite via tanh(ln u) =
    (u^2-1)/(u^2+1) was tried and benched SLOWER on the v5e VPU — the
    divide plus the overflow-guard select cost more than the native
    tanh/log1p; the stock form also fuses better.)
    """
    return x * jnp.tanh(jax.nn.softplus(x))


@mish.defjvp
def _mish_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    t = jnp.tanh(jax.nn.softplus(x))
    s = jax.nn.sigmoid(x)
    return x * t, (t + x * s * (1.0 - t * t)) * dx


def l1_loss(target: jnp.ndarray, output: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(target - output).mean()


def l2_loss(target: jnp.ndarray, output: jnp.ndarray) -> jnp.ndarray:
    """Elementwise squared error (reduction='none' MSE)."""
    return jnp.square(target - output)


def reduce_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims -> shape (B,)."""
    return x.mean(axis=tuple(range(1, x.ndim)))


def reduce_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over all non-batch dims -> shape (B,)."""
    return x.sum(axis=tuple(range(1, x.ndim)))


def flat_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over non-batch dims, scaled to bits (divide by ln 2)."""
    return reduce_mean(x) / math.log(2.0)


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL( N(mean1, exp(logvar1)) || N(mean2, exp(logvar2)) ), broadcasting.

    0.5 * (logvar2 - logvar1 - 1 + exp(logvar1 - logvar2)
           + (mean1 - mean2)^2 * exp(-logvar2))
    """
    logvar1 = jnp.asarray(logvar1, dtype=jnp.result_type(float))
    logvar2 = jnp.asarray(logvar2, dtype=jnp.result_type(float))
    return 0.5 * (
        logvar2
        - logvar1
        - 1.0
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh approximation of the standard normal CDF (Ho et al.)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(
    x: jnp.ndarray, *, means: jnp.ndarray, log_scales: jnp.ndarray
) -> jnp.ndarray:
    """Log-likelihood of a Gaussian discretized to the +-1/255 image grid.

    ``x`` is assumed to be uint8 data rescaled to [-1, 1].  Returns log
    probabilities (nats), same shape as x.
    """
    log_scales = jnp.broadcast_to(log_scales, x.shape)
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))
        ),
    )


def min_max_norm_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize over the whole batch."""
    return (x - x.min()) / (x.max() - x.min())


def min_max_norm_image(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize each image in the batch independently."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    x_min = flat.min(axis=1).reshape((b,) + (1,) * (x.ndim - 1))
    x_max = flat.max(axis=1).reshape((b,) + (1,) * (x.ndim - 1))
    return (x - x_min) / (x_max - x_min)
