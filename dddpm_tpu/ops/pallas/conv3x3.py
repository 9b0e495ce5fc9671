"""Fused 3x3 convolution kernel (implicit GEMM over row bands).

Motivation (measured on the v5e chip, scripts/probe_conv_roofline.py):
XLA's conv3x3 runs at ~96-111 TFLOPs where a dense matmul reaches ~139,
and every Block (reference models/unet/blocks.py:74-84) pays two extra
full-tensor HBM round trips for GroupNorm+Mish between convs.  This
kernel computes

    y = conv3x3(prologue(x) [+ res], W) + b
    prologue(x) = mish(x * scale + shift) + post_bias   (all optional)

in one pass: the normalize/activate work rides the VPU while the MXU
runs the 9 tap matmuls, and the inter-block activation tensor never
makes a separate HBM round trip.  `scale`/`shift` are per-(batch,
channel) f32 arrays: GroupNorm folded per batch element
(scale = g / (std_group + eps), shift = b - mean_group * scale), so the
kernel itself stays elementwise.  An optional stats output accumulates
per-(batch, channel) sum / sum-of-squares of y for computing the NEXT
block's GroupNorm without re-reading y.

Layout: NHWC, C multiple of 128 (lane width), W a multiple of 8.
Grid = (B, H / TH) row bands; halo rows come from two extra single-row
block specs (clamped index maps + edge masking).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dddpm_tpu.ops.math import mish


def _shift_w(band, dx):
    """Shift a (R, W, C) band along W by dx in {-1, 0, +1}, zero-fill."""
    if dx == 0:
        return band
    r, w, c = band.shape
    zero = jnp.zeros((r, 1, c), band.dtype)
    if dx == 1:   # operand column j-1: prepend zeros, drop last
        return jnp.concatenate([zero, band[:, :-1]], axis=1)
    return jnp.concatenate([band[:, 1:], zero], axis=1)


def _conv_kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, y_ref, *,
                 th, w, cin, cout, apply_mish):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    x = x_ref[0]                                   # (TH, W, Cin)
    top = top_ref[0]                               # (1, W, Cin)
    bot = bot_ref[0]
    # zero out-of-image halo rows
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nt - 1, jnp.zeros_like(bot), bot)
    band = jnp.concatenate([top, x, bot], axis=0)  # (TH+2, W, Cin)
    if apply_mish:
        band = mish(band.astype(jnp.float32)).astype(band.dtype)

    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dy in range(3):
        rows = band[dy:dy + th]
        for dx in range(3):
            opnd = _shift_w(rows, 1 - dx).reshape(th * w, cin)
            acc += jnp.dot(opnd, w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)
    y_ref[0] = acc.reshape(th, w, cout).astype(y_ref.dtype)


def conv3x3_fused(x, w, b, *, apply_mish: bool = False, th: int = 8,
                  interpret: bool = False):
    """y = conv3x3(mish(x) if apply_mish else x, w) + b.  NHWC, stride 1.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); b: (Cout,).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % th == 0, (h, th)
    nt = h // th

    w9 = w.reshape(9, cin, cout)
    b2 = b.reshape(1, cout)

    x_spec = pl.BlockSpec((1, th, wd, cin), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    # halo rows: single-row blocks at element rows j*th-1 and (j+1)*th,
    # clamped into range (masked to zero in-kernel at the image edges)
    top_spec = pl.BlockSpec(
        (1, 1, wd, cin),
        lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec(
        (1, 1, wd, cin),
        lambda i, j: (i, jnp.minimum((j + 1) * th, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_conv_kernel, th=th, w=wd, cin=cin, cout=cout,
                apply_mish=apply_mish),
        grid=(bsz, nt),
        in_specs=[x_spec, top_spec, bot_spec, w_spec, b_spec],
        out_specs=x_spec if cin == cout else pl.BlockSpec(
            (1, th, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, w9, b2)
