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

from dddpm_tpu.ops.math import mish
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
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)  # biased
        out = (xf - mean) / (jnp.sqrt(var) + self.eps) * g + b
        return out.astype(x.dtype)


class Block(nn.Module):
    """Conv3x3 -> GroupNorm(groups) -> Mish."""

    dim: int
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv3x3(self.dim_out, self.dim, dtype=self.dtype)(x)
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = Block(self.dim, self.dim_out, self.groups, dtype=self.dtype)(x)

        # time-emb projected through Mish -> Dense, added as channel bias
        t = nn.Dense(self.dim_out, kernel_init=dense_kernel_init,
                     bias_init=bias_init_for(time_emb.shape[-1]),
                     name="time_proj")(mish(time_emb))
        h = h + t[:, None, None, :].astype(self.dtype)

        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = Block(self.dim_out, self.dim_out, self.groups, dtype=self.dtype)(h)

        if self.dim != self.dim_out:
            res = conv1x1(self.dim_out, self.dim, dtype=self.dtype,
                          name="res_conv")(x)
        else:
            res = x
        return h + res


class LinearAttention(nn.Module):
    """Linear attention (softmax over keys' token axis).

    context[d, e] = sum_n softmax_n(k)[n, d] * v[n, e]
    out[n, e]     = sum_d context[d, e] * q[n, d]

    Both contractions are (tokens x dim) matmuls — MXU-friendly; the
    softmax + two einsums are fused by XLA (a Pallas fused kernel is
    provided in ops/pallas for the hot path).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = conv1x1(hidden * 3, self.dim, use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        # split ordering matches the reference layout '(qkv heads c)'
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_pallas:
            from dddpm_tpu.ops.pallas.linear_attention import linear_attention

            # heads stay folded in the lane axis: (B, N, heads*dim_head)
            fold = lambda t: t.reshape(b, h * w, hidden)
            out = linear_attention(fold(q), fold(k), fold(v), self.dim_head)
            out = out.reshape(b, h * w, self.heads, self.dim_head)
        else:
            k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
            context = jnp.einsum("bnhd,bnhe->bhde", k, v)
            out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden)
        return conv1x1(self.dim, hidden, dtype=self.dtype, name="to_out")(out)


class PreNormLinearAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) as used at every resolution."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ChannelLayerNorm(self.dim)(x)
        h = LinearAttention(self.dim, dtype=self.dtype,
                            use_pallas=self.use_pallas)(h)
        return x + h


class Downsample(nn.Module):
    """Strided conv3x3 halving spatial dims."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv3x3(self.dim, self.dim, stride=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Transposed conv 4x4 stride 2 doubling spatial dims."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose2d(4, 2, 1) output = 2x input; flax 'SAME'
        # padding reproduces that exactly for k=4, s=2
        return nn.ConvTranspose(
            self.dim,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            kernel_init=conv_transpose_kernel_init,
            bias_init=bias_init_for(16 * self.dim),
            dtype=self.dtype,
        )(x)
