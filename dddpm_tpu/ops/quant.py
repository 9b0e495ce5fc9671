"""Int8 (W8A8) quantized convolution for the serving/sampling path.

The v5e MXU runs s8 x s8 -> s32 contractions at ~2x the bf16 rate.  The
x2 sampling headline is conv-MXU-bound (BENCH_NOTES roofline: 40 ms of
the 55 ms step is conv time at XLA's bf16 conv rate), so an OPT-IN
quantized sampling mode buys throughput that bf16 provably cannot
(three hand-kernel families all landed on XLA's own rate).  Measured
round trips at the x2 inventory shapes (scripts/probe_int8_static.py,
results/probe_int8_static.json): static-scale quantize -> s8 conv ->
f32 dequant runs 1.29x (128^2 c128) / 1.57x (64^2 c256) the bf16 conv;
channel-EXPANDING convs (128->256) measured slower and stay bf16 via
the shape gate below.

Scheme (standard TPU serving PTQ):
  - weights: symmetric per-output-channel s8, quantized in-graph from
    the bf16/f32 params (XLA hoists the loop-invariant quantization out
    of the sampling chain's scan);
  - activations: symmetric per-tensor s8 with a STATIC scale read from
    a flax "quant" collection.  Static scales keep the quantize a pure
    elementwise op that XLA fuses into the producer (GroupNorm/Mish
    epilogue); a dynamic absmax scale would serialize a full reduction
    pass per conv (measured: dynamic round trip is 1.13x vs static
    1.29x at the dominant shape).
  - calibration: run forward passes with mutable=["quant"]; each gated
    conv site tracks the running absmax of its input.  Serving applies
    with the frozen collection.

Gradients are NOT defined for the quantized path (jnp.round has zero
derivative a.e.) — this mode is for sampling/serving only, and the
factory refuses it for training (models/factory.py).

Reference parity note: the reference has no quantized mode; this is a
TPU-native extension, default OFF, explicitly opt-in via
--quant-conv int8 (generate_model_samples.py) / config["conv_quant"].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def quant_conv_wins(kk: int, spatial: int, cin: int, cout: int,
                    stride: int = 1) -> bool:
    """Shape gate: quantize only conv sites whose shape class measured
    faster than bf16 on the v5e (results/probe_int8_static.json).

    Measured rules at bs 96 (speedup = bf16 ms / int8 ms):
      - stride-1 channel-preserving convs with c >= 128 WIN across the
        board: 1.30x (128^2 c128), 1.58x (64^2 c256), 1.19x (32^2
        c256), 1.17x (64^2 c128), 1.07x (16^2 c256), and 2x2 variants
        1.17-1.25x;
      - channel-CHANGING convs don't: expanding 128->256 loses (0.85x
        — the s32->f32 epilogue writes the larger tensor), reducing
        256->128 is neutral (1.00x);
      - strided downsamples are marginal (1.09x / 0.99x) — excluded;
      - tiny-channel convs (8->128 stem, 128->8 final 1x1) are
        bandwidth-bound and lose badly (0.42x / 0.96x).
    """
    del spatial  # wins at every measured spatial size >= 16
    return (stride == 1 and cin == cout and cin >= 128
            and kk in (2, 3))


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel s8 quantization of an HWIO kernel.

    Returns (wq s8 HWIO, scale f32 (cout,)).  In-graph and cheap (the
    kernel is ~100 KB vs the conv's GFLOPs); inside a sampling chain's
    scan the quantization is loop-invariant and hoisted by XLA.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor s8 quantization with a given static scale."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8)


def act_scale_from_amax(amax: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, act_amax: jnp.ndarray,
              stride: Tuple[int, int] = (1, 1),
              padding=((1, 1), (1, 1))) -> jnp.ndarray:
    """Quantized NHWC conv: s8(x) x s8(kernel) -> s32, dequantized f32.

    `act_amax` is the calibrated absmax of x (scalar); the returned
    tensor is f32 (caller casts/adds bias).
    """
    xs = act_scale_from_amax(act_amax)
    wq, ws = quantize_weight(kernel)
    acc = lax.conv_general_dilated(
        quantize_act(x, xs), wq, stride, padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * ws)


def observed_amax(x: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
    """Running absmax update used during calibration."""
    return jnp.maximum(prev.astype(jnp.float32),
                       jnp.max(jnp.abs(x.astype(jnp.float32))))
