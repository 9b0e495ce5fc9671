"""Variational helpers (Gaussian log-densities, reparametrization,
Gaussian sample/merge layers).

Parity with the reference's vestigial VAE-era module
(models/variational/distributions.py — never imported by its models
package but part of the component inventory).  Provided as working JAX
equivalents so VAE-family models can be layered on this framework.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def log_standard_gaussian(x: jnp.ndarray) -> jnp.ndarray:
    """log N(x | 0, I), summed over non-batch dims."""
    logp = -0.5 * (math.log(2 * math.pi) + x * x)
    return logp.reshape(x.shape[0], -1).sum(-1)


def log_gaussian(x: jnp.ndarray, mu: jnp.ndarray,
                 log_var: jnp.ndarray) -> jnp.ndarray:
    """log N(x | mu, diag(exp(log_var))), summed over non-batch dims."""
    logp = -0.5 * (math.log(2 * math.pi) + log_var
                   + jnp.square(x - mu) * jnp.exp(-log_var))
    return logp.reshape(x.shape[0], -1).sum(-1)


def reparametrize(rng: jax.Array, mu: jnp.ndarray,
                  log_var: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * sigma, eps ~ N(0, I)."""
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * log_var)


class GaussianSample(nn.Module):
    """Dense layers producing (z, mu, log_var) from features."""

    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, rng: jax.Array):
        mu = nn.Dense(self.out_features, name="mu")(x)
        log_var = nn.Dense(self.out_features, name="log_var")(x)
        return reparametrize(rng, mu, log_var), mu, log_var


class GaussianMerge(nn.Module):
    """Precision-weighted merge of two Gaussians (Ladder-VAE style)."""

    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mu1: jnp.ndarray,
                 log_var1: jnp.ndarray, rng: jax.Array):
        mu2 = nn.Dense(self.out_features, name="mu")(x)
        log_var2 = nn.Dense(self.out_features, name="log_var")(x)
        prec1, prec2 = jnp.exp(-log_var1), jnp.exp(-log_var2)
        mu = (mu1 * prec1 + mu2 * prec2) / (prec1 + prec2)
        var = 1.0 / (prec1 + prec2)
        log_var = jnp.log(var + 1e-8)
        return reparametrize(rng, mu, log_var), mu, log_var
