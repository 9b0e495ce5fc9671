"""Static-scale int8 conv round trip at every x2-inventory shape.

probe_int8_roundtrip.py measured the DYNAMIC round trip (per-tensor
absmax in-step): 1.13-1.41x at the dominant shapes but 0.82x at the
channel-expanding 64^2 128->256.  The absmax reduction + re-read is
pure overhead a serving mode does not need: calibrated static
activation scales turn the quantize into one fuseable elementwise op
(clip(round(x * inv_scale))), and weights are pre-quantized outside the
chain.  This probe times bf16 vs static-scale s8xs8 at ALL 15 conv
shapes of the x2 roofline inventory (results/roofline_x2_bs96.json),
same scan-in-one-jit harness, and writes results/probe_int8_static.json.

    python scripts/probe_int8_static.py
"""
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
from jax import lax

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()

DN = ("NHWC", "HWIO", "NHWC")


def run(name, bs, h, cin, cout, kk=3, stride=1):
    x = jnp.ones((bs, h, h, cin), jnp.bfloat16)
    w = jnp.ones((kk, kk, cin, cout), jnp.bfloat16)
    pad = "SAME" if stride == 1 else [(kk // 2, kk // 2)] * 2
    st = (stride, stride)

    def feedback(y, x_):
        """Shape the conv output back into the carry's shape/dtype so
        the scan serializes (tile/slice channels and spatial)."""
        if y.shape[-1] < cin:
            y = jnp.tile(y, (1, 1, 1, cin // y.shape[-1] + 1))
        y = y[..., :cin]
        if y.shape[1] != h:
            r = h // y.shape[1]
            y = jnp.tile(y, (1, r, r, 1))[:, :h, :h]
        return y.astype(x_.dtype)

    def step_bf16(x_, w_):
        y = lax.conv_general_dilated(x_, w_, st, pad, dimension_numbers=DN)
        return feedback(y, x_)

    # static scales: act scale is a traced scalar closed over (like a
    # calibration-table param), weights pre-quantized per-out-channel
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    wq = jnp.clip(jnp.round(w.astype(jnp.float32)
                            / (jnp.maximum(amax, 1e-12) / 127.0)),
                  -127, 127).astype(jnp.int8)
    ws = jnp.maximum(amax, 1e-12) / 127.0
    xs = jnp.float32(1.0 / 127.0)   # pretend calibrated per-site scale

    def step_q(x_, wq_ws):
        wq_, ws_ = wq_ws
        xq = jnp.clip(jnp.round(x_.astype(jnp.float32) / xs),
                      -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, wq_, st, pad, dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (xs * ws_)
        return feedback(y, x_)

    out = {}
    for label, step, op in [("bf16", step_bf16, w), ("q-static", step_q,
                                                     (wq, ws))]:
        try:
            out[label] = timed_scan(step, (x, op), scan_len=20, reps=3) * 1e3
        except Exception as e:  # noqa: BLE001
            out[label] = f"FAILED {str(e)[:80]}"
    sp = ""
    if all(isinstance(out.get(k), float) for k in ("bf16", "q-static")):
        sp = f"  speedup: {out['bf16'] / out['q-static']:.2f}x"

    def fmt(v):
        return format(v, "7.3f") if isinstance(v, float) else str(v)

    print(f"{name:28s} bf16: {fmt(out['bf16'])} ms  q-static: "
          f"{fmt(out['q-static'])} ms{sp}", flush=True)
    return {"conv": name, **{k: (v if isinstance(v, str) else round(v, 4))
                             for k, v in out.items()}}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bs = 96
    # the full x2 conv inventory (roofline_x2_bs96.json), minus the
    # 4x4T upsamples (the shipped subpixel path decomposes them into
    # 2x2 s1 convs, covered by the 2x2 row)
    shapes = [
        ("3x3 128^2 128->128 s1", 128, 128, 128, 3, 1),
        ("3x3 64^2 256->256 s1", 64, 256, 256, 3, 1),
        ("3x3 64^2 128->256 s1", 64, 128, 256, 3, 1),
        ("3x3 64^2 256->128 s1", 64, 256, 128, 3, 1),
        ("3x3 64^2 128->128 s2", 64, 128, 128, 3, 2),
        ("3x3 32^2 256->256 s2", 32, 256, 256, 3, 2),
        ("3x3 32^2 256->256 s1", 32, 256, 256, 3, 1),
        ("3x3 64^2 128->128 s1", 64, 128, 128, 3, 1),
        ("3x3 128^2 8->128 s1", 128, 8, 128, 3, 1),
        ("3x3 16^2 256->256 s2", 16, 256, 256, 3, 2),
        ("3x3 16^2 256->256 s1", 16, 256, 256, 3, 1),
        ("2x2 16^2 256->256 s1", 16, 256, 256, 2, 1),
        ("2x2 64^2 256->256 s1", 64, 256, 256, 2, 1),
        ("2x2 128^2 128->128 s1", 128, 128, 128, 2, 1),
        ("1x1 128^2 128->8 s1", 128, 128, 8, 1, 1),
    ]
    rows = []
    for name, h, cin, cout, kk, stride in shapes:
        rows.append(run(name, bs, h, cin, cout, kk=kk, stride=stride))
    with open("results/probe_int8_static.json", "w") as f:
        json.dump({"bs": bs, "rows": rows}, f, indent=1)
    print("wrote results/probe_int8_static.json", flush=True)


if __name__ == "__main__":
    main()
