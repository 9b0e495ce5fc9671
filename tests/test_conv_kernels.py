"""Equivalence tests for the Pallas conv kernels (interpret mode on CPU).

ops/pallas/conv3x3.py — implicit-GEMM conv with optional fused mish
prologue; ops/pallas/winograd.py + ops/winograd.py — Winograd F(2x2,3x3).
Both compute the same function as lax.conv_general_dilated 'SAME'.
(On the v5e bench chip XLA's direct conv matched or beat both — see the
module docstrings — so the production UNet keeps XLA convs; the kernels
stay as tested building blocks.)
"""
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from dddpm_tpu.ops.math import mish
from dddpm_tpu.ops.pallas.conv3x3 import conv3x3_fused
from dddpm_tpu.ops.pallas.winograd import conv3x3_winograd
from dddpm_tpu.ops.winograd import conv3x3_winograd_ref, transform_weights


def _ref(x, w, b, apply_mish=False):
    if apply_mish:
        x = mish(x.astype(jnp.float32)).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _data(shape, cout, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, shape, jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1),
                          (3, 3, shape[-1], cout)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (cout,)) * 0.1
    return x, w, b


@pytest.mark.parametrize("shape,cout,apply_mish", [
    ((2, 16, 16, 128), 128, False),
    ((1, 16, 8, 128), 256, True),
    ((2, 32, 16, 256), 128, False),
])
def test_conv3x3_fused_matches_xla(shape, cout, apply_mish):
    x, w, b = _data(shape, cout)
    got = conv3x3_fused(x, w, b, apply_mish=apply_mish)
    want = _ref(x, w, b, apply_mish)
    assert jnp.max(jnp.abs(got - want)) < 1e-3


def test_conv3x3_fused_gn_fold_prologue():
    """prologue(x) = mish(x*scale+shift) + post_bias, per (batch,
    channel) — the folded-GroupNorm form (measured at the ResnetBlock
    seam on the v5e: in-graph XLA wins; see BENCH_NOTES.md)."""
    shape, cout = (2, 16, 16, 128), 128
    x, w, b = _data(shape, cout)
    k = jax.random.PRNGKey(7)
    scale = 1.0 + 0.1 * jax.random.normal(k, (shape[0], shape[-1]))
    shift = 0.2 * jax.random.normal(jax.random.fold_in(k, 1),
                                    (shape[0], shape[-1]))
    pbias = 0.2 * jax.random.normal(jax.random.fold_in(k, 2),
                                    (shape[0], shape[-1]))
    got = conv3x3_fused(x, w, b, scale=scale, shift=shift,
                        post_bias=pbias)
    pro = (mish(x.astype(jnp.float32) * scale[:, None, None, :]
                + shift[:, None, None, :]).astype(x.dtype)
           + pbias[:, None, None, :].astype(x.dtype))
    want = _ref(pro, w, b)
    assert jnp.max(jnp.abs(got - want)) < 1e-3


def test_conv3x3_fused_gn_fold_zero_padding_is_operand_space():
    """Out-of-image conv padding must be zero AFTER the prologue
    (prologue(0) != 0): check rows at the top/bottom image edges."""
    shape, cout = (1, 16, 8, 128), 128
    x, w, b = _data(shape, cout)
    scale = jnp.ones((1, 128))
    shift = jnp.full((1, 128), 0.5)   # prologue(0) = mish(0.5) != 0
    got = conv3x3_fused(x, w, b, scale=scale, shift=shift)
    pro = mish(x.astype(jnp.float32) + 0.5).astype(x.dtype)
    want = _ref(pro, w, b)
    assert jnp.max(jnp.abs(got - want)) < 1e-3


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 16), 24),
    ((1, 16, 6, 8), 8),
])
def test_winograd_ref_matches_conv(shape, cout):
    x, w, b = _data(shape, cout)
    got = conv3x3_winograd_ref(x, w, b)
    want = _ref(x, w, b)
    assert jnp.max(jnp.abs(got - want)) < 1e-4


def test_winograd_weight_transform_shape():
    w = jnp.ones((3, 3, 8, 16))
    u = transform_weights(w)
    assert u.shape == (4, 4, 8, 16)


@pytest.mark.parametrize("shape,cout,apply_mish,th", [
    ((2, 16, 16, 128), 128, False, 8),
    ((1, 16, 8, 128), 256, True, 8),
    ((2, 32, 16, 256), 128, False, 16),
])
def test_winograd_kernel_matches_xla(shape, cout, apply_mish, th):
    x, w, b = _data(shape, cout)
    got = conv3x3_winograd(x, w, b, apply_mish=apply_mish, th=th)
    want = _ref(x, w, b, apply_mish)
    # transforms run at bf16 matmul precision inside the kernel
    assert jnp.max(jnp.abs(got - want)) < 5e-2
