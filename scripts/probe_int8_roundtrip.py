"""In-graph cost of a dynamically-quantized int8 conv round trip.

probe_int8.py showed s8xs8 conv3x3 at the x2 headline's dominant shape
runs 1.63x faster than bf16 (150.7 vs 92.5 T/s through jax/axon).  A
serving mode pays more than the bare conv: per-tensor activation
absmax -> quantize, per-out-channel weight quantize (hoistable), and
the f32 dequant scale on the s32 accumulator.  This probe times the
WHOLE round trip vs the bf16 conv at the x2 chain's two dominant
shapes plus the 4x4 transposed conv, same scan-in-one-jit harness.

    python scripts/probe_int8_roundtrip.py
"""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
from jax import lax

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()

DN = ("NHWC", "HWIO", "NHWC")


def q_act(x):
    """Per-tensor symmetric s8 quantization with a dynamic scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def q_weight(w):
    """Per-output-channel symmetric s8 quantization."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wq.astype(jnp.int8), scale


def conv_bf16(x, w, stride=(1, 1), transpose=False):
    if transpose:
        return lax.conv_transpose(x, w, stride, "SAME",
                                  dimension_numbers=DN)
    return lax.conv_general_dilated(x, w, stride, "SAME",
                                    dimension_numbers=DN)


def conv_q(x, w, stride=(1, 1), transpose=False):
    xq, xs = q_act(x)
    wq, ws = q_weight(w)
    if transpose:
        acc = lax.conv_transpose(xq, wq, stride, "SAME",
                                 dimension_numbers=DN,
                                 preferred_element_type=jnp.int32)
    else:
        acc = lax.conv_general_dilated(xq, wq, stride, "SAME",
                                       dimension_numbers=DN,
                                       preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (xs * ws)).astype(x.dtype)


def run(name, bs, h, cin, cout, kk=3, stride=(1, 1), transpose=False):
    x = jnp.ones((bs, h, h, cin), jnp.bfloat16)
    w = (jnp.ones((kk, kk, cin, cout), jnp.bfloat16) if not transpose
         else jnp.ones((kk, kk, cout, cin), jnp.bfloat16))
    if transpose:
        w = jnp.ones((kk, kk, cin, cout), jnp.bfloat16)

    def step_bf16(x_, w_):
        return conv_bf16(x_, w_, stride, transpose)[..., :cin].astype(
            x_.dtype)

    def step_q(x_, w_):
        return conv_q(x_, w_, stride, transpose)[..., :cin]

    # static-weight variant: weights pre-quantized outside the step
    wq0, ws0 = q_weight(w)

    def step_q_staticw(x_, wq_ws):
        wq_, ws_ = wq_ws
        xq, xs = q_act(x_)
        if transpose:
            acc = lax.conv_transpose(xq, wq_, stride, "SAME",
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        else:
            acc = lax.conv_general_dilated(
                xq, wq_, stride, "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (xs * ws_)).astype(x_.dtype)
        return y[..., :cin]

    out = {}
    for label, step, op in [("bf16", step_bf16, w),
                            ("q-dyn", step_q, w),
                            ("q-staticw", step_q_staticw, (wq0, ws0))]:
        try:
            s = timed_scan(step, (x, op), scan_len=20, reps=3)
            out[label] = s * 1e3
        except Exception as e:  # noqa: BLE001
            out[label] = f"FAILED {str(e)[:80]}"
    msg = "  ".join(f"{k}: {v:7.3f} ms" if isinstance(v, float)
                    else f"{k}: {v}" for k, v in out.items())
    sp = ""
    if isinstance(out.get("bf16"), float):
        for k in ("q-dyn", "q-staticw"):
            if isinstance(out.get(k), float):
                sp += f"  {k}-speedup: {out['bf16'] / out[k]:.2f}x"
    print(f"{name:32s} {msg}{sp}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bs = 96
    run("3x3 128^2 128->128", bs, 128, 128, 128)
    run("3x3 64^2 256->256", bs, 64, 256, 256)
    run("3x3 64^2 128->256", bs, 64, 128, 256)
    run("4x4T 128^2 128->128 s1", bs, 128, 128, 128, kk=4,
        transpose=True)
    run("3x3 32^2 256->256", bs, 32, 256, 256)


if __name__ == "__main__":
    main()
