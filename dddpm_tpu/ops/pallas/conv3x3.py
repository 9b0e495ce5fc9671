"""Fused 3x3 convolution kernel (implicit GEMM over row bands).

Motivation (measured on the v5e chip, scripts/probe_conv_roofline.py):
XLA's conv3x3 runs at ~96-111 TFLOPs where a dense matmul reaches ~139,
and every Block (reference models/unet/blocks.py:74-84) pays two extra
full-tensor HBM round trips for GroupNorm+Mish between convs.  This
kernel computes

    y = conv3x3(prologue(x), W) + b
    prologue(x) = mish(x * scale + shift) + post_bias   (all optional)

in one pass: the normalize/activate work rides the VPU while the MXU
runs the 9 tap matmuls, and the inter-block activation tensor never
makes a separate HBM round trip.  `scale`/`shift` are per-(batch,
channel) f32 arrays: GroupNorm folded per batch element
(scale = g * rsqrt(var_group + eps), shift = b - mean_group * scale),
so the kernel itself stays elementwise; `post_bias` covers the
time-embedding channel bias.

Measured verdict (v5e, scripts/probe_block_fusion.py, BENCH_NOTES.md):
at the ResnetBlock inner seam XLA's unfused graph BEATS this fusion by
8-35% — XLA already hides the GN/Mish passes inside the conv pipeline
(its whole 2-conv seam costs less than two isolated convs).  Kept as a
tested building block; the production UNet keeps XLA convs.

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


def _conv_kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, *refs, th, w,
                 cin, cout, apply_mish, has_prologue, has_pbias):
    scale_ref = shift_ref = pbias_ref = None
    if has_prologue:
        scale_ref, shift_ref = refs[0], refs[1]
        if has_pbias:
            pbias_ref = refs[2]
    y_ref = refs[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    x = x_ref[0]                                   # (TH, W, Cin)
    top = top_ref[0]                               # (1, W, Cin)
    bot = bot_ref[0]
    band = jnp.concatenate([top, x, bot], axis=0)  # (TH+2, W, Cin)
    if has_prologue:
        # folded GroupNorm: per-(batch, channel) affine in f32, then
        # mish, rounded to the model dtype BEFORE the post-bias add so
        # the result bit-matches the unfused Block -> (+ time bias).
        # scale/shift/pbias arrive as full (B, C) blocks (tiny); the
        # batch row is picked in-kernel (a (1, C) BlockSpec would
        # violate the sublane-divisibility rule).
        band = (band.astype(jnp.float32) * scale_ref[pl.ds(i, 1), :]
                + shift_ref[pl.ds(i, 1), :])
        band = mish(band).astype(x.dtype)
        if has_pbias:
            # pbias is f32 in VMEM (bf16 dynamic row loads do not
            # lower); adding the bf16-exact values in f32 and rounding
            # bit-matches the model's bf16 add
            band = (band.astype(jnp.float32)
                    + pbias_ref[pl.ds(i, 1), :]).astype(x.dtype)
    elif apply_mish:
        band = mish(band.astype(jnp.float32)).astype(band.dtype)

    # zero out-of-image halo rows AFTER the prologue: conv padding is
    # zeros in operand space (prologue(0) != 0)
    row = lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    valid = ((row > 0) | (j > 0)) & ((row < th + 1) | (j < nt - 1))
    band = jnp.where(valid, band, jnp.zeros_like(band))

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
                  scale=None, shift=None, post_bias=None,
                  interpret: bool = False):
    """y = conv3x3(prologue(x), w) + b.  NHWC, stride 1.

    prologue(x) = mish(x * scale + shift) + post_bias when `scale` is
    given (folded GroupNorm + Mish + e.g. time-embedding bias, all
    per-(batch, channel) f32/model-dtype arrays of shape (B, Cin));
    else mish(x) when apply_mish; else identity.

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

    has_prologue = scale is not None
    has_pbias = post_bias is not None
    assert has_prologue or not has_pbias, "post_bias requires scale/shift"
    extra, extra_specs = [], []
    if has_prologue:
        assert shift is not None
        bc_spec = pl.BlockSpec((bsz, cin), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        extra = [scale.astype(jnp.float32).reshape(bsz, cin),
                 shift.astype(jnp.float32).reshape(bsz, cin)]
        extra_specs = [bc_spec, bc_spec]
        if has_pbias:
            extra.append(post_bias.astype(jnp.float32).reshape(bsz, cin))
            extra_specs.append(bc_spec)

    return pl.pallas_call(
        partial(_conv_kernel, th=th, w=wd, cin=cin, cout=cout,
                apply_mish=apply_mish, has_prologue=has_prologue,
                has_pbias=has_pbias),
        grid=(bsz, nt),
        in_specs=[x_spec, top_spec, bot_spec, w_spec, b_spec,
                  *extra_specs],
        out_specs=x_spec if cin == cout else pl.BlockSpec(
            (1, th, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, w9, b2, *extra)
