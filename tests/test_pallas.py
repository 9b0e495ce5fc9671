"""Pallas kernel equivalence tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.ops.pallas.linear_attention import (
    _pick_tile,
    _reference_impl,
    linear_attention,
)


def _qkv(key, b, n, hd):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, n, hd)) for k in ks)


def test_pick_tile():
    assert _pick_tile(16384) == 2048
    assert _pick_tile(256) == 256
    assert _pick_tile(1024) == 1024
    assert 3000 % _pick_tile(3000) == 0  # halves until it divides


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_linear_attention_matches_reference(n):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, n, 128)
    got = np.asarray(linear_attention(q, k, v, 32, True))
    want = np.asarray(_reference_impl(q, k, v, 32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_linear_attention_single_head():
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 128, 32)
    got = np.asarray(linear_attention(q, k, v, 32, True))
    want = np.asarray(_reference_impl(q, k, v, 32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_linear_attention_bf16():
    q, k, v = (t.astype(jnp.bfloat16)
               for t in _qkv(jax.random.PRNGKey(2), 1, 512, 128))
    got = np.asarray(linear_attention(q, k, v, 32, True), np.float32)
    want = np.asarray(_reference_impl(q, k, v, 32), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_linear_attention_gradients_match_reference():
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 64, 64)

    f_fused = lambda q, k, v: jnp.sum(linear_attention(q, k, v, 32, True) ** 2)
    f_ref = lambda q, k, v: jnp.sum(_reference_impl(q, k, v, 32) ** 2)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


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
    la._fused_forward = lambda q, k, v, d, interpret=False: orig(q, k, v, d, True)
    try:
        net_pl = Unet(**kwargs, use_pallas=True)
        out_pl = net_pl.apply(params, x, t)
    finally:
        la._fused_forward = orig
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=2e-3, atol=1e-4)


def test_fused_attention_block_matches_module_path():
    """attention_block kernel == PreNormLinearAttention einsum path."""
    from dddpm_tpu.models.blocks import PreNormLinearAttention

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 128))
    mod = PreNormLinearAttention(dim=128, use_pallas=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)

    mod_pl = PreNormLinearAttention(dim=128, use_pallas=True)
    got = mod_pl.apply(params, x)  # same params: structures are identical
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_block_wider_channels():
    from dddpm_tpu.models.blocks import PreNormLinearAttention

    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 256))
    mod = PreNormLinearAttention(dim=256, use_pallas=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    got = PreNormLinearAttention(dim=256, use_pallas=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_block_gradients():
    from dddpm_tpu.models.blocks import PreNormLinearAttention

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 128))
    mod = PreNormLinearAttention(dim=128, use_pallas=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    mod_pl = PreNormLinearAttention(dim=128, use_pallas=True)

    g_ref = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    g_pl = jax.grad(lambda p: jnp.sum(mod_pl.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_attention_block_clamped_regime_consistency():
    """If any k-logit exceeds K_CLAMP, the fused forward (unshifted
    clamped exp) must still equal _reference_impl (which applies the
    SAME clamp before its softmax) — so the custom-VJP backward is
    derived from the function the forward actually computes."""
    from dddpm_tpu.ops.pallas import attention_block as ab

    c, hidden = 64, 128
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (1, 64, c))
    g = jnp.ones(c) + 0.1 * jax.random.normal(ks[1], (c,))
    b = 0.1 * jax.random.normal(ks[2], (c,))
    # blow up the k-slab so logits far exceed K_CLAMP
    w_qkv = jax.random.normal(ks[3], (c, 3 * hidden))
    w_qkv = w_qkv.at[:, hidden:2 * hidden].mul(10.0 * ab.K_CLAMP)
    w_out = jax.random.normal(ks[4], (hidden, c)) * 0.1
    b_out = 0.1 * jax.random.normal(ks[5], (c,))

    ref = ab._reference_impl(x, g, b, w_qkv, w_out, b_out, 32)
    # sanity: the clamp actually binds for this input
    ln = ab._layer_norm_f32(x, g, b)
    logits = ln @ w_qkv[:, hidden:2 * hidden]
    assert float(jnp.max(logits)) > ab.K_CLAMP
    got = ab.attention_block(x, g, b, w_qkv, w_out, b_out, 32, True)
    assert np.isfinite(np.asarray(got)).all()
    # loose tolerance: exp(~K_CLAMP) magnitudes make f32 accumulation
    # order visible; this checks consistency, not precision
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


def test_attention_tile_policy_by_channel_width():
    """c<=128 blocks tile at 8192 tokens, c=256 at 4096 (scoped-VMEM:
    the f32 kv temporary at c=256/t8192 alone would be 16 MB)."""
    from dddpm_tpu.ops.pallas import attention_block as ab

    assert ab._pick_tile(16384, 8192) == 8192
    assert ab._pick_tile(16384, 4096) == 4096
    assert ab._pick_tile(1024, 8192) == 1024  # tile never exceeds n


def test_attention_group_policy():
    """Batch-group factor: largest of 8/4/2 dividing the batch with
    group*n <= 4096 tokens per grid step; multi-tile blocks (nt > 1)
    and batches with no even divisor stay ungrouped."""
    from dddpm_tpu.ops.pallas import attention_block as ab

    assert ab._pick_group(96, 256, 1) == 8    # 8*256 = 2048 <= 4096
    assert ab._pick_group(96, 1024, 1) == 4   # 8 would exceed the cap
    assert ab._pick_group(96, 4096, 1) == 1   # single tile already full
    assert ab._pick_group(96, 256, 2) == 1    # multi-tile: ungrouped
    assert ab._pick_group(7, 256, 1) == 1     # no divisor in {8,4,2}
    assert ab._pick_group(4, 256, 1) == 4     # batch smaller than 8


def test_attention_small_n_takes_xla_path(monkeypatch):
    """N <= XLA_PATH_MAX_TOKENS dispatches to the plain einsum path on
    accelerators (two pallas launches cost more than fusion saves at
    16^2 latents): the output must be BIT-identical to _reference_impl."""
    from dddpm_tpu.ops.pallas import attention_block as ab

    c, hidden = 128, 128
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    n = ab.XLA_PATH_MAX_TOKENS
    x = jax.random.normal(ks[0], (2, n, c))
    g = jnp.ones(c) + 0.1 * jax.random.normal(ks[1], (c,))
    b = 0.1 * jax.random.normal(ks[2], (c,))
    w_qkv = jax.random.normal(ks[3], (c, 3 * hidden)) * 0.1
    w_out = jax.random.normal(ks[4], (hidden, c)) * 0.1
    b_out = 0.1 * jax.random.normal(ks[5], (c,))

    # pretend we are on an accelerator so interpret is not forced on;
    # the small-N branch must return before any pallas_call is built
    monkeypatch.setattr(ab.jax, "default_backend", lambda: "tpu")
    called = []
    monkeypatch.setattr(ab.pl, "pallas_call",
                        lambda *a, **k: called.append(1))
    got = ab._fused_forward(x, g, b, w_qkv, w_out, b_out, 32, False)
    want = ab._reference_impl(x, g, b, w_qkv, w_out, b_out, 32)
    assert not called
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_one_pass_kernel_matches_reference():
    """The single-dispatch phased kernel (a measured perf NEGATIVE
    result, kept as proof apparatus behind DDDPM_ATTN_ONE_PASS) must
    stay numerically equivalent to _reference_impl, including the
    multi-tile accumulate/emit phases and the in-kernel W_eff fold."""
    from dddpm_tpu.ops.pallas import attention_block as ab

    c, hidden = 128, 128
    ks = jax.random.split(jax.random.PRNGKey(13), 6)
    for n in (768, 8192):  # single-tile and multi-tile (nt=4 at t2048)
        x = jax.random.normal(ks[0], (2, n, c))
        g = jnp.ones(c) + 0.1 * jax.random.normal(ks[1], (c,))
        b = 0.1 * jax.random.normal(ks[2], (c,))
        w_qkv = jax.random.normal(ks[3], (c, 3 * hidden)) * 0.1
        w_out = jax.random.normal(ks[4], (hidden, c)) * 0.1
        b_out = 0.1 * jax.random.normal(ks[5], (c,))
        want = ab._reference_impl(x, g, b, w_qkv, w_out, b_out, 32)
        got = ab._fused_forward_1pass(x, g, b, w_qkv, w_out, b_out,
                                      32, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
