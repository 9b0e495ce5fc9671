"""Unit tests for the math primitives in dddpm_tpu.ops.math."""
import math

import numpy as np
import jax.numpy as jnp
from scipy import stats

from dddpm_tpu.ops import math as dmath


def test_mish_matches_definition():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(dmath.mish(jnp.asarray(x)))
    want = x * np.tanh(np.log1p(np.exp(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_reduce_ops():
    x = np.random.RandomState(0).randn(4, 3, 5, 5).astype(np.float32)
    np.testing.assert_allclose(
        dmath.reduce_mean(jnp.asarray(x)), x.reshape(4, -1).mean(1),
        rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        dmath.reduce_sum(jnp.asarray(x)), x.reshape(4, -1).sum(1), rtol=1e-4
    )
    np.testing.assert_allclose(
        dmath.flat_bits(jnp.asarray(x)),
        x.reshape(4, -1).mean(1) / math.log(2),
        rtol=1e-5, atol=1e-6,
    )


def test_normal_kl_closed_form():
    rng = np.random.RandomState(1)
    m1, lv1 = rng.randn(8), rng.randn(8)
    m2, lv2 = rng.randn(8), rng.randn(8)
    got = np.asarray(dmath.normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                                     jnp.asarray(m2), jnp.asarray(lv2)))
    v1, v2 = np.exp(lv1), np.exp(lv2)
    want = np.log(np.sqrt(v2) / np.sqrt(v1)) + (v1 + (m1 - m2) ** 2) / (2 * v2) - 0.5
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_normal_kl_identical_is_zero():
    m = jnp.array([0.3, -1.2])
    lv = jnp.array([0.1, -0.4])
    np.testing.assert_allclose(dmath.normal_kl(m, lv, m, lv), 0.0, atol=1e-7)


def test_normal_kl_broadcasts_scalars():
    # prior KL usage: normal_kl(mean, logvar, 0., 0.)
    m = jnp.ones((2, 3))
    out = dmath.normal_kl(m, jnp.zeros((2, 3)), 0.0, 0.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out, 0.5, rtol=1e-6)


def test_approx_cdf_close_to_true_cdf():
    x = np.linspace(-4, 4, 81)
    got = np.asarray(dmath.approx_standard_normal_cdf(jnp.asarray(x)))
    want = stats.norm.cdf(x)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_discretized_gaussian_ll_integrates_to_one():
    # Sum of probabilities over all 256 bins must be ~1 for any mean/scale
    bins = (np.arange(256) / 127.5 - 1.0).astype(np.float64)
    x = jnp.asarray(bins).reshape(1, -1)
    means = jnp.full_like(x, 0.13)
    log_scales = jnp.full_like(x, -1.0)
    logp = dmath.discretized_gaussian_log_likelihood(
        x, means=means, log_scales=log_scales
    )
    total = np.exp(np.asarray(logp)).sum()
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_discretized_gaussian_ll_edge_bins():
    # x < -0.999 uses the left-open bin; x > 0.999 the right-open bin
    x = jnp.array([[-1.0, 1.0]])
    logp = dmath.discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.full_like(x, 3.0)
    )
    # with huge scale both open bins contain ~half the mass
    np.testing.assert_allclose(np.exp(np.asarray(logp)), 0.5, atol=0.02)


def test_discretized_gaussian_ll_broadcast_log_scales():
    x = jnp.zeros((2, 4, 4, 3))
    out = dmath.discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.zeros((2, 1, 1, 1))
    )
    assert out.shape == x.shape


def test_min_max_norm_image_per_image():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 4, 4, 2).astype(np.float32)
    out = np.asarray(dmath.min_max_norm_image(jnp.asarray(x)))
    for i in range(3):
        np.testing.assert_allclose(out[i].min(), 0.0, atol=1e-6)
        np.testing.assert_allclose(out[i].max(), 1.0, atol=1e-6)


def test_min_max_norm_batch_global():
    x = jnp.arange(12.0).reshape(3, 4)
    out = np.asarray(dmath.min_max_norm_batch(x))
    assert out.min() == 0.0 and out.max() == 1.0
