"""Subpixel (phase-decomposed) 2x transposed convolution.

The UNet's Upsample is a ConvTranspose(kernel 4x4, stride 2) — reference
models/unet/blocks.py:32.  XLA lowers a transposed conv to a regular
conv over the zero-dilated input, so the MXU burns k^2 = 16 taps per
output pixel even though only 4 of them ever touch real data (the other
12 hit interleaved zeros).  Measured on a v5e chip this makes
ConvTranspose ~3.7x slower than the equivalent dense computation.

This module computes the identical function as four dense 2x2 convs
(one per output parity phase) followed by a pixel-shuffle interleave:

    out[2m+pi, 2n+pj] = phase_conv[pi, pj](x)[m, n]

Derivation (per spatial dim, kernel k=4, stride 2): flax ConvTranspose
calls lax.conv_transpose(transpose_kernel=False), which runs a plain
cross-correlation over the 2x-dilated input with pad 2 each side
(lax._conv_transpose_padding for 'SAME'):

    o[p] = sum_d xdil[p + d - 2] * w[d],  xdil[2i] = x[i]
    p = 2m     -> w[0] x[m-1] + w[2] x[m]
    p = 2m + 1 -> w[1] x[m]   + w[3] x[m+1]

i.e. the even phase is the 2-tap conv w[0::2] over window (m-1, m) and
the odd phase is w[1::2] over (m, m+1) — no kernel flip.

Exact-equivalence is asserted against flax nn.ConvTranspose in
tests/test_convt.py.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv_transpose_2x_subpixel(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """2x-upsampling transposed conv via phase decomposition.

    Args:
      x: (B, H, W, Cin).
      kernel: (4, 4, Cin, Cout) — flax nn.ConvTranspose layout (HWIO,
        not flipped: flax uses lax.conv_transpose(transpose_kernel=False)).
      bias: optional (Cout,).

    Returns:
      (B, 2H, 2W, Cout), numerically equal to
      nn.ConvTranspose(Cout, (4, 4), (2, 2), padding='SAME').
    """
    b, h, w, cin = x.shape
    kh, kw = kernel.shape[:2]
    assert (kh, kw) == (4, 4), "subpixel path is specialized to k=4 s=2"
    cout = kernel.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")

    phases = []
    for pi in range(2):
        for pj in range(2):
            wk = kernel[pi::2, pj::2]  # (2, 2, Cin, Cout)
            pad_h = (1 - pi, pi)     # even: window (m-1, m); odd: (m, m+1)
            pad_w = (1 - pj, pj)
            y = lax.conv_general_dilated(
                x, wk, window_strides=(1, 1), padding=(pad_h, pad_w),
                dimension_numbers=dn)
            phases.append(y)

    y = jnp.stack(phases, axis=3)                 # (B, H, W, 4, Cout)
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)             # (B, H, 2, W, 2, C)
    y = y.reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
