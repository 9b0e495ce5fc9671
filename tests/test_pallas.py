"""Pallas kernel equivalence tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from dddpm_tpu.ops.pallas.linear_attention import (
    _reference_impl,
    linear_attention,
)


def test_linear_attention_matches_reference():
    rng = jax.random.PRNGKey(0)
    bh, n, d = 8, 64, 32
    q = jax.random.normal(rng, (bh, n, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (bh, n, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (bh, n, d))
    got = np.asarray(linear_attention(q, k, v, True))
    want = np.asarray(_reference_impl(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_linear_attention_gradients_match_reference():
    rng = jax.random.PRNGKey(3)
    bh, n, d = 2, 16, 8
    q = jax.random.normal(rng, (bh, n, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (bh, n, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (bh, n, d))

    f_fused = lambda q, k, v: jnp.sum(linear_attention(q, k, v, True) ** 2)
    f_ref = lambda q, k, v: jnp.sum(_reference_impl(q, k, v) ** 2)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_unet_with_pallas_attention_matches_einsum_path():
    """Full UNet forward: pallas attention path == einsum path."""
    from dddpm_tpu.models.unet import Unet

    kwargs = dict(dim=8, in_channels=1, dim_mults=(1, 2), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([1, 7])

    net_ref = Unet(**kwargs, use_pallas=False)
    params = net_ref.init(jax.random.PRNGKey(0), x, t)
    out_ref = net_ref.apply(params, x, t)

    import dddpm_tpu.ops.pallas.linear_attention as la
    orig = la._fused_forward
    la._fused_forward = lambda q, k, v, interpret=False: orig(q, k, v, True)
    try:
        net_pl = Unet(**kwargs, use_pallas=True)
        out_pl = net_pl.apply(params, x, t)
    finally:
        la._fused_forward = orig
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=2e-3, atol=1e-4)
