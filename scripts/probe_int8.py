"""Does int8 hit the v5e MXU's 2x-rate path through this stack?

The x2 headline's remaining gap is pinned on XLA's bf16 conv rate
(BENCH_NOTES roofline).  v5e's MXU runs int8 at ~394 TOPS nominal —
2x the 197 TF bf16 rate.  If s8 x s8 -> s32 contractions actually
reach that rate through jax/axon, a quantized sampling mode (optional,
explicitly labeled) can cross the baseline where bf16 provably cannot.

Probes, each timed as a scan-in-one-jit (tunnel-safe):
  1. dot_general s8 x s8 -> s32 at the headline's dominant implicit-GEMM
     shape (M=96*128*128 rows tiled, K=1152, N=128) vs the same in bf16.
  2. lax.conv_general_dilated with s8 operands (supported at all?).
  3. A bigger square matmul (8192^3-ish) for the clean MXU rate.

    python scripts/probe_int8.py
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()


def probe_matmul(m, k, n, in_dtype, acc_dtype, iters=30):
    a = jnp.ones((m, k), in_dtype)
    b = jnp.ones((k, n), in_dtype)

    def step(a_, b_):
        out = lax.dot_general(a_, b_, (((1,), (0,)), ((), ())),
                              preferred_element_type=acc_dtype)
        # feed output back into the carry's dtype so the scan serializes
        return (out[:, :k] if n >= k else
                jnp.tile(out, (1, k // n + 1))[:, :k]).astype(in_dtype)

    s = timed_scan(step, (a, b), scan_len=iters, reps=3)
    fl = 2 * m * k * n
    return s * 1e3, fl / s / 1e12


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # 1. clean big matmul rate, bf16 vs int8
    for name, dt, acc in [("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)]:
        try:
            ms, tops = probe_matmul(8192, 8192, 8192, dt, acc, iters=10)
            print(f"matmul 8192^3 {name:5s}: {ms:7.2f} ms  {tops:6.1f} "
                  f"T{'OP' if dt == jnp.int8 else 'FLOP'}/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"matmul 8192^3 {name}: FAILED {str(e)[:150]}", flush=True)

    # 2. the headline's dominant implicit-GEMM shape: K=1152 (3x3x128),
    #    N=128, M = bs*H*W = 96*128*128 (tile M to keep memory sane)
    m, k, n = 96 * 128 * 128 // 8, 1152, 128
    for name, dt, acc in [("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)]:
        try:
            ms, tops = probe_matmul(m, k, n, dt, acc, iters=30)
            print(f"gemm {m}x{k}x{n} {name:5s}: {ms:7.3f} ms  {tops:6.1f} "
                  f"T/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"gemm dominant {name}: FAILED {str(e)[:150]}", flush=True)

    # 3. conv_general_dilated directly in s8 (NHWC, 3x3, same pad)
    bs, h, c = 96, 128, 128
    for name, dt, acc in [("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)]:
        x = jnp.ones((bs, h, h, c), dt)
        w = jnp.ones((3, 3, c, c), dt)

        def conv_step(x_, w_):
            y = lax.conv_general_dilated(
                x_, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return y.astype(dt)

        try:
            s = timed_scan(conv_step, (x, w), scan_len=20, reps=3)
            fl = 2 * bs * h * h * 9 * c * c
            print(f"conv3x3 {bs}x{h}^2x{c} {name:5s}: {s * 1e3:7.3f} ms  "
                  f"{fl / s / 1e12:6.1f} T/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"conv3x3 {name}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
