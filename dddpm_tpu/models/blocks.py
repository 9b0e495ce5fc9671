"""UNet building blocks (flax.linen, NHWC layout).

Behavioural parity with /root/reference/models/unet/blocks.py, redesigned
for TPU: channels-last convolutions (native XLA TPU layout), a single
compute dtype knob for bfloat16 MXU execution with float32 params, and
the linear attention written as two batched einsums that XLA maps
directly onto the MXU.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dddpm_tpu.ops.convt import conv_transpose_2x_subpixel
from dddpm_tpu.ops.math import mish
from dddpm_tpu.ops.quant import (
    int8_conv,
    observed_amax,
    quant_conv_wins,
)
from dddpm_tpu.models.init import (
    bias_init_for,
    conv_kernel_init,
    conv_transpose_kernel_init,
    dense_kernel_init,
)


def conv3x3(features: int, in_features: int, stride: int = 1, use_bias: bool = True,
            dtype=jnp.float32, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=use_bias,
        kernel_init=conv_kernel_init,
        bias_init=bias_init_for(9 * in_features),
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, in_features: int, use_bias: bool = True,
            dtype=jnp.float32, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        use_bias=use_bias,
        kernel_init=conv_kernel_init,
        bias_init=bias_init_for(in_features),
        dtype=dtype,
        name=name,
    )


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal timestep embedding.

    Always computed in float32 — t runs up to T=1000 and bf16 cannot
    resolve adjacent steps there.
    """

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeMLP(nn.Module):
    """SinusoidalPosEmb -> Dense(4*dim) -> Mish -> Dense(dim), float32."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = SinusoidalPosEmb(self.dim)(t)
        emb = nn.Dense(self.dim * 4, kernel_init=dense_kernel_init,
                       bias_init=bias_init_for(self.dim))(emb)
        emb = mish(emb)
        emb = nn.Dense(self.dim, kernel_init=dense_kernel_init,
                       bias_init=bias_init_for(self.dim * 4))(emb)
        return emb


class ChannelLayerNorm(nn.Module):
    """Channel-only LayerNorm with biased variance and eps added to std.

    Matches the reference quirk exactly: (x - mean) / (std + eps) * g + b
    (reference blocks.py:50-60 adds eps to the *std*, not the variance).
    Params are declared in setup so the fused Pallas attention block can
    consume them directly.
    """

    dim: int
    eps: float = 1e-5

    def setup(self):
        self.g = self.param("g", nn.initializers.ones, (self.dim,))
        self.b = self.param("b", nn.initializers.zeros, (self.dim,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)  # biased
        out = (xf - mean) / (jnp.sqrt(var) + self.eps) * self.g + self.b
        return out.astype(x.dtype)


class Conv3x3Params(nn.Module):
    """3x3 'SAME' conv with nn.Conv's exact param layout (kernel
    (3, 3, in, out) + bias (out,)) that can consume a skip-connection
    operand WITHOUT materializing the channel concat:

        conv(concat(x, skip), W) == conv(x, W[:, :, :Cx])
                                  + conv(skip, W[:, :, Cx:])

    The UNet's expansive path feeds every level a (C + C)-channel
    concat; splitting saves the concat tensor's HBM round trip
    (measured 6.34 -> 5.78 ms at 64^2 c256+256 bs 96).

    With quant='int8' (the opt-in SERVING mode, ops/quant.py), conv
    sites whose shape class measured faster in s8 run as W8A8 quantized
    convs with calibrated per-tensor activation scales held in the
    flax "quant" collection; applying with mutable=["quant"] runs the
    calibration update.  Forward-only — no quantized VJP."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32
    stride: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_kernel_init,
            (3, 3, self.in_features, self.features))
        bias = self.param(
            "bias", bias_init_for(9 * self.in_features), (self.features,))
        dn = ("NHWC", "HWIO", "NHWC")
        k = kernel.astype(x.dtype)
        st = (self.stride, self.stride)

        # no preferred_element_type: TPU convs accumulate f32 in the
        # MXU regardless, nn.Conv does the same, and mixed
        # bf16-operand/f32-output convs have a broken VJP (the
        # transposed conv gets mismatched dtypes)
        def conv(v, w):
            return jax.lax.conv_general_dilated(
                v, w, st, ((1, 1), (1, 1)), dimension_numbers=dn)

        def qconv(v, w, amax_name):
            """int8 path for one operand; falls back to bf16 where the
            shape gate says quantization measured slower."""
            if not (self.quant == "int8" and quant_conv_wins(
                    3, v.shape[1], v.shape[-1], w.shape[-1], self.stride)):
                return conv(v, w.astype(v.dtype)).astype(jnp.float32)
            var = self.variable("quant", amax_name,
                                lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant"):
                var.value = observed_amax(v, var.value)
            return int8_conv(v, w, var.value, stride=st)

        if self.quant == "int8":
            if skip is None:
                y = qconv(x, kernel, "amax_x")
            else:
                y = (qconv(x, kernel[:, :, :x.shape[-1]], "amax_x")
                     + qconv(skip, kernel[:, :, x.shape[-1]:], "amax_skip"))
            y = y.astype(x.dtype)
        elif skip is None:
            y = conv(x, k)
        else:
            cx = x.shape[-1]
            y = conv(x, k[:, :, :cx]) + conv(skip.astype(x.dtype),
                                             k[:, :, cx:])
        return y + bias.astype(y.dtype)


class Block(nn.Module):
    """Conv3x3 -> GroupNorm(groups) -> Mish.

    `skip` feeds the conv as the second half of its input channels
    without materializing the concat (see Conv3x3Params)."""

    dim: int
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = Conv3x3Params(self.dim_out, self.dim, dtype=self.dtype,
                          quant=self.quant,
                          name="Conv_0")(x.astype(self.dtype), skip)
        # GroupNorm statistics in f32 for stability
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return mish(x).astype(self.dtype)


class ResnetBlock(nn.Module):
    """Two conv Blocks with a time-embedding bias and residual 1x1 conv."""

    dim: int
    dim_out: int
    groups: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb: jnp.ndarray,
                 deterministic: bool = True,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """`skip` is the expansive-path skip connection, logically
        concatenated onto x's channels; both convs that consume it
        (Block 1's 3x3 and the residual 1x1) split their kernels
        instead of materializing the concat (see Conv3x3Params)."""
        h = Block(self.dim, self.dim_out, self.groups,
                  dtype=self.dtype, quant=self.quant)(x, skip=skip)

        # time-emb projected through Mish -> Dense, added as channel bias
        t = nn.Dense(self.dim_out, kernel_init=dense_kernel_init,
                     bias_init=bias_init_for(time_emb.shape[-1]),
                     name="time_proj")(mish(time_emb))
        h = h + t[:, None, None, :].astype(self.dtype)

        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = Block(self.dim_out, self.dim_out, self.groups, dtype=self.dtype,
                  quant=self.quant)(h)

        in_dim = self.dim if skip is None else x.shape[-1] + skip.shape[-1]
        assert in_dim == self.dim, (in_dim, self.dim)
        if self.dim != self.dim_out:
            res = ConvParams1x1(self.dim, self.dim_out,
                                name="res_conv")(x, skip=skip)
        else:
            res = x if skip is None else jnp.concatenate(
                [x, skip], axis=-1)
        return h + res


class ConvParams1x1(nn.Module):
    """Parameter container for a 1x1 conv, shaped/named exactly like
    nn.Conv's (kernel (1, 1, in, out), optional bias (out,)) so
    checkpoints are interchangeable with a module-based conv."""

    in_features: int
    features: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", conv_kernel_init, (1, 1, self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param(
                "bias", bias_init_for(self.in_features), (self.features,))

    @property
    def matrix(self):
        return self.kernel[0, 0]

    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        m = self.matrix.astype(x.dtype)
        if skip is None:
            y = x @ m
        else:
            # concat-free: matmul(concat(x, skip), m) split by rows of m
            cx = x.shape[-1]
            y = x @ m[:cx] + skip @ m[cx:]
        if self.use_bias:
            y = y + self.bias.astype(x.dtype)
        return y


class LinearAttention(nn.Module):
    """Linear attention (softmax over keys' token axis).

    context[d, e] = sum_n softmax_n(k)[n, d] * v[n, e]
    out[n, e]     = sum_d context[d, e] * q[n, d]

    Both contractions are (tokens x dim) matmuls — MXU-friendly. The
    1x1 qkv/out convs are explicit matmuls over flattened tokens (same
    math, same param shapes as convs).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hidden = self.heads * self.dim_head
        self.to_qkv = ConvParams1x1(self.dim, hidden * 3, use_bias=False)
        self.to_out = ConvParams1x1(hidden, self.dim, use_bias=True)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = self.to_qkv(x.reshape(b, h * w, c))
        # split ordering matches the reference layout '(qkv heads c)'
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = self.to_out(out.reshape(b, h * w, hidden))
        return out.reshape(b, h, w, self.dim)


class PreNormLinearAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) as used at every resolution.

    With use_pallas=True the whole block (LN -> qkv -> attention ->
    out-proj -> residual) runs as the fused two-pass Pallas kernel in
    ops/pallas/attention_block.py — the block is bandwidth-bound, and
    fusion cuts its HBM traffic ~8x.  Both paths share identical
    parameter structure.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.norm = ChannelLayerNorm(self.dim)
        self.attn = LinearAttention(self.dim, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from dddpm_tpu.ops.pallas.attention_block import attention_block

            b, h, w, c = x.shape
            out = attention_block(
                x.reshape(b, h * w, c),
                self.norm.g, self.norm.b,
                self.attn.to_qkv.matrix.astype(self.dtype),
                self.attn.to_out.matrix.astype(self.dtype),
                self.attn.to_out.bias.astype(jnp.float32),
                self.attn.dim_head,
            )
            return out.reshape(b, h, w, c)
        return x + self.attn(self.norm(x))


class Downsample(nn.Module):
    """Strided conv3x3 halving spatial dims.

    Stays bf16 even under quant='int8': strided int8 convs measured
    neutral-to-negative (ops/quant.py quant_conv_wins)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv3x3(self.dim, self.dim, stride=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Transposed conv 4x4 stride 2 doubling spatial dims.

    Two numerically identical paths, picked by static output size
    (measured on a v5e chip, scripts/probe_unet_split.py):

    - small tensors: the subpixel phase decomposition (ops/convt.py) —
      4 dense 2x2 convs + interleave, ~4x fewer MXU FLOPs than the
      zero-dilated conv XLA lowers ConvTranspose to;
    - large tensors: nn.ConvTranspose — at large batch the subpixel
      interleave's layout shuffle costs more than the FLOPs it saves
      (59.4 vs 63.9 ms/eval at bs 96 on the 128^2-latent UNet).
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    # output elements (B*2H*2W*C) above this use nn.ConvTranspose
    subpixel_max_elems: int = 64 * 1024 * 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose2d(4, 2, 1) output = 2x input; flax 'SAME'
        # padding reproduces that exactly for k=4, s=2.  Params live in
        # a child scope named like nn.ConvTranspose so checkpoints are
        # interchangeable between both paths.
        b, h, w, _ = x.shape
        use_subpixel = (b * 4 * h * w * self.dim) <= self.subpixel_max_elems
        params = ConvTransposeParams4x4(
            self.dim, use_subpixel=use_subpixel, name="ConvTranspose_0")
        return params(x.astype(self.dtype))


class ConvTransposeParams4x4(nn.Module):
    """nn.ConvTranspose((4,4),(2,2),'SAME')-compatible params (kernel
    (4, 4, in, out) + bias (out,)), applied via the subpixel
    decomposition or the stock transposed conv."""

    features: int
    use_subpixel: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_transpose_kernel_init,
            (4, 4, x.shape[-1], self.features))
        bias = self.param(
            "bias", bias_init_for(16 * self.features), (self.features,))
        if self.use_subpixel:
            return conv_transpose_2x_subpixel(x, kernel.astype(x.dtype), bias)
        y = jax.lax.conv_transpose(
            x, kernel.astype(x.dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)
