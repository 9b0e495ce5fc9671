"""Golden tests for beta schedules and derived buffers.

Verified against the closed-form DDPM equations (Ho et al. eq. 4/6/7)
computed independently in float64 numpy, matching the reference
precompute at /root/reference/models/diffusion/ddpm.py:54-106.
"""
import numpy as np
import pytest

from dddpm_tpu.models.schedule import (
    DiffusionSchedule,
    gather,
    make_beta_schedule,
)


def test_linear_schedule_endpoints():
    betas = make_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 2e-2)
    assert np.all(np.diff(betas) > 0)


def test_linear_schedule_scales_with_T():
    # scale = 1000/T keeps the same total noise budget for any T
    betas = make_beta_schedule("linear", 100)
    np.testing.assert_allclose(betas[0], 10 * 1e-4)
    np.testing.assert_allclose(betas[-1], 10 * 2e-2)


def test_cosine_schedule_properties():
    betas = make_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    # alphas_cumprod follows cos^2 profile: starts near 1, ends near 0
    ac = np.cumprod(1 - betas)
    assert ac[0] > 0.99
    assert ac[-1] < 1e-3


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_beta_schedule("sqrt_banana", 10)


@pytest.mark.parametrize("name,T", [("linear", 1000), ("cosine", 250), ("linear", 100)])
def test_derived_buffers_match_closed_form(name, T):
    sched = DiffusionSchedule.create(name, T)
    betas = make_beta_schedule(name, T)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = (1.0 - ac_prev) / (1.0 - ac) * betas

    rtol = 1e-6
    np.testing.assert_allclose(sched.betas, betas, rtol=rtol)
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=rtol)
    np.testing.assert_allclose(sched.alphas_cumprod_prev, ac_prev, rtol=rtol)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(ac), rtol=rtol)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - ac), rtol=rtol
    )
    np.testing.assert_allclose(
        sched.log_one_minus_alphas_cumprod, np.log(1 - ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod, np.sqrt(1 / ac), rtol=rtol
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / ac - 1), rtol=2e-5
    )
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=rtol)
    np.testing.assert_allclose(
        sched.posterior_log_variance_clipped,
        np.log(np.append(post_var[1], post_var[1:])),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef1, np.sqrt(ac_prev) * betas / (1 - ac), rtol=rtol
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2, np.sqrt(alphas) * (1 - ac_prev) / (1 - ac),
        rtol=rtol,
    )


def test_vlb_weights():
    sched = DiffusionSchedule.create("linear", 100)
    betas = make_beta_schedule("linear", 100)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = (1.0 - ac_prev) / (1.0 - ac) * betas
    with np.errstate(divide="ignore"):  # post_var[0] == 0 by construction
        w = betas**2 / (2 * post_var * alphas * (1 - ac))
    w[0] = w[1]  # t=0 weight copied from t=1 (posterior var is 0 at t=0)
    np.testing.assert_allclose(sched.vlb_weights, w, rtol=1e-5)
    assert np.isfinite(np.asarray(sched.vlb_weights)).all()


def test_posterior_mean_coefs_sum_identity():
    # At x = x_t the posterior mean must interpolate: coef1 + coef2 -> 1
    # only when alphas_cumprod relation holds; check the algebraic identity
    # coef1 * sqrt(ac) + coef2 * 1 = (stuff) — instead sanity check eq 7:
    # posterior mean of (x0=0, xt=0) is 0 and variance positive for t>0.
    sched = DiffusionSchedule.create("linear", 50)
    assert np.all(np.asarray(sched.posterior_variance)[1:] > 0)
    assert np.asarray(sched.posterior_variance)[0] == 0.0


def test_gather_shapes():
    import jax.numpy as jnp

    sched = DiffusionSchedule.create("linear", 100)
    t = jnp.array([0, 3, 99])
    out = gather(sched.sqrt_alphas_cumprod, t, ndim=4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(
        out[:, 0, 0, 0], np.asarray(sched.sqrt_alphas_cumprod)[[0, 3, 99]]
    )
