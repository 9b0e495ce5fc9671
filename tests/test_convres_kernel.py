"""Fused ConvResBlock kernel (ops/pallas/convres.py) vs the pure-JAX
reference, interpreter mode on CPU: forward equivalence (f32 + bf16,
multiple shapes/tiles), full gradient equivalence, and the halo/edge
masking (top and bottom image rows are the regression surface)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.ops.pallas.convres import (
    _reference_impl,
    fused_convres_block,
)


def _make(key, cio=16, cm=8, b=2, h=32, w=16, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (b, h, w, cio), dtype)
    w1 = jax.random.normal(ks[1], (1, 1, cio, cm)) * (1 / np.sqrt(cio))
    b1 = jax.random.normal(ks[2], (cm,)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, cm, cm)) * (1 / np.sqrt(9 * cm))
    b2 = jax.random.normal(ks[4], (cm,)) * 0.1
    w3 = jax.random.normal(ks[5], (3, 3, cm, cm)) * (1 / np.sqrt(9 * cm))
    b3 = jax.random.normal(ks[6], (cm,)) * 0.1
    w4 = jax.random.normal(ks[7], (1, 1, cm, cio)) * (1 / np.sqrt(cm))
    b4 = jax.random.normal(ks[8], (cio,)) * 0.1
    return x, w1, b1, w2, b2, w3, b3, w4, b4


@pytest.mark.parametrize("h,w", [(32, 16), (16, 16), (48, 8)])
def test_fused_convres_forward_matches_reference(h, w):
    args = _make(jax.random.PRNGKey(0), h=h, w=w)
    want = _reference_impl(*args, residual=True)
    got = fused_convres_block(*args, residual=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_convres_forward_no_residual():
    args = _make(jax.random.PRNGKey(1))
    want = _reference_impl(*args, residual=False)
    got = fused_convres_block(*args, residual=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_convres_forward_bf16():
    args = _make(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    want = np.asarray(_reference_impl(*args, residual=True), np.float32)
    got = np.asarray(
        fused_convres_block(*args, residual=True, interpret=True),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_convres_edge_rows_exact():
    """Top/bottom image rows exercise the halo masks: with a large bias
    (mish(b) far from 0) any mask slip shows up at rows 0-1 and H-2..H-1."""
    args = list(_make(jax.random.PRNGKey(3), h=16, w=8))
    args[2] = args[2] + 2.0   # b1 large
    args[4] = args[4] + 2.0   # b2 large
    want = _reference_impl(*args, residual=True)
    got = fused_convres_block(*args, residual=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:, :2], np.asarray(want)[:, :2],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[:, -2:],
                               np.asarray(want)[:, -2:],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_convres_gradients_match_reference():
    args = _make(jax.random.PRNGKey(4), h=32, w=16)

    def loss_fused(*a):
        return jnp.sum(fused_convres_block(*a, residual=True,
                                           interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_impl(*a, residual=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3", "dw4", "db4"]
    for n, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch: {n}")


def test_fused_convres_gradients_no_residual_and_edges():
    """Gradients with large biases (edge-mask coverage in the backward)."""
    args = list(_make(jax.random.PRNGKey(5), h=16, w=8))
    args[2] = args[2] + 1.5
    args[4] = args[4] - 1.5

    def loss_fused(*a):
        return jnp.sum(fused_convres_block(*a, residual=False,
                                           interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_impl(*a, residual=False) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for i, (a, b) in enumerate(zip(g_fused, g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient arg {i}")


def test_convresblock_pallas_wiring_matches_reference(monkeypatch):
    """ConvResBlock(use_pallas=True) routes through fused_convres_block
    with the SAME flax params as the reference conv path (interpret
    mode on CPU; the spatial gate is lowered so a small map is
    eligible)."""
    from dddpm_tpu.models import resample

    monkeypatch.setattr(resample, "FUSED_MIN_PIXELS", 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 32))
    kw = dict(dim=32, in_channels=32, out_channels=32, residual=True)
    m_ref = resample.ConvResBlock(use_pallas=False, **kw)
    m_pal = resample.ConvResBlock(use_pallas=True, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x)
    want = m_ref.apply(params, x)
    got = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradients flow through the custom VJP to the same param tree
    def loss(p, m):
        return jnp.sum(m.apply(p, x) ** 2)

    g_ref = jax.grad(loss)(params, m_ref)
    g_pal = jax.grad(loss)(params, m_pal)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch at {path}")

    jax.tree_util.tree_map_with_path(check, g_ref, g_pal)


def test_convresblock_gate_respects_shape_constraints():
    """The fused gate must reject shapes the kernel cannot tile."""
    from dddpm_tpu.models.resample import ConvResBlock

    def gate(shape, **kw):
        kw.setdefault("dim", 32)
        kw.setdefault("in_channels", 32)
        kw.setdefault("out_channels", 32)
        m = ConvResBlock(use_pallas=True, **kw)
        _, hh, ww, _ = shape
        return m._fused_shape_ok(hh, ww)

    assert gate((1, 128, 128, 32))
    assert gate((1, 256, 256, 64), dim=32, in_channels=64, out_channels=64)
    assert not gate((1, 64, 64, 32))            # below the spatial gate
    assert not gate((1, 128, 126, 32))          # W % 4 != 0
    assert not gate((1, 129, 128, 32))          # H not tileable by 16
    assert not gate((1, 128, 128, 32), in_channels=32, out_channels=64,
                    dim=32)                     # cio != cout
    assert not gate((1, 128, 128, 24), in_channels=24, out_channels=24,
                    dim=32)                     # 4*cio not lane-aligned


def test_convresblock_pallas_whole_block_scaling(monkeypatch):
    """With dropout inactive, ConvResBlock(use_pallas=True) folds the
    residual add AND the 2x pool/upsample INTO the kernel (VERDICT r3
    item 5); outputs must match the reference block exactly, including
    gradients through the scaling VJP."""
    from dddpm_tpu.models import resample

    monkeypatch.setattr(resample, "FUSED_MIN_PIXELS", 0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 32))
    for mode in ({"downsample": True}, {"upsample": True}, {}):
        kw = dict(dim=32, in_channels=32, out_channels=32, residual=True,
                  **mode)
        m_ref = resample.ConvResBlock(use_pallas=False, **kw)
        m_pal = resample.ConvResBlock(use_pallas=True, **kw)
        params = m_ref.init(jax.random.PRNGKey(1), x)
        want = m_ref.apply(params, x)
        got = m_pal.apply(params, x)
        assert got.shape == want.shape, (mode, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"forward {mode}")

        def loss(p, m):
            return jnp.sum(m.apply(p, x) ** 2)

        g_ref = jax.grad(loss)(params, m_ref)
        g_pal = jax.grad(loss)(params, m_pal)

        def check(path, a, b):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch at {path} ({mode})")

        jax.tree_util.tree_map_with_path(check, g_ref, g_pal)


def test_convresblock_dropout_keeps_scaling_outside(monkeypatch):
    """With ACTIVE dropout the kernel must not fold residual/scaling
    (dropout sits between the conv core and the residual add): the
    train-mode pallas block must equal the reference train-mode block
    under the same dropout rng."""
    from dddpm_tpu.models import resample

    monkeypatch.setattr(resample, "FUSED_MIN_PIXELS", 0)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 32))
    kw = dict(dim=32, in_channels=32, out_channels=32, residual=True,
              downsample=True, dropout=0.5)
    m_ref = resample.ConvResBlock(use_pallas=False, **kw)
    m_pal = resample.ConvResBlock(use_pallas=True, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    want = m_ref.apply(params, x, False, rngs=rngs)
    got = m_pal.apply(params, x, False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
