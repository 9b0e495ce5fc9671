"""Per-shape cost of the residual PreNorm linear-attention block:
fused Pallas kernel vs unfused XLA einsum path, at the headline x2
sampling chain's eight block shapes (bs 96).

Finds where the ablation-measured ~12 ms/eval of attention goes and
which shapes (if any) should prefer the XLA path.

    python scripts/probe_attention_shapes.py [--bs 96]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dddpm_tpu.ops.pallas.attention_block import (  # noqa: E402
    _reference_impl, attention_block)

# (H, W, C) blocks of the x2 chain UNet at 128^2 latent, in graph order
SHAPES = [
    (128, 128, 128),
    (64, 64, 256),
    (32, 32, 256),
    (16, 16, 256),  # down level 4
    (16, 16, 256),  # mid
    (16, 16, 256),  # up level 1
    (32, 32, 256),
    (64, 64, 128),
]


def timed_scan(fn, args, scan_len=50):
    @jax.jit
    def chain(*a):
        def body(c, _):
            return fn(*((c,) + a[1:])), None
        y, _ = lax.scan(body, a[0], None, length=scan_len)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(chain(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / scan_len)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    args = p.parse_args()
    bw = 855e9  # measured copy GB/s (roofline run)

    uniq = {}
    for s in SHAPES:
        uniq[s] = uniq.get(s, 0) + 1

    tot_f = tot_x = tot_floor = 0.0
    print(f"{'shape':18s} {'n':>2s} {'fused ms':>9s} {'xla ms':>8s} "
          f"{'3-pass floor':>12s}")
    for (h, w, c), n in uniq.items():
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.bs, h * w, c), jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        wqkv = (jax.random.normal(key, (c, 384), jnp.float32) * 0.05
                ).astype(jnp.bfloat16)
        wout = (jax.random.normal(key, (128, c), jnp.float32) * 0.05
                ).astype(jnp.bfloat16)
        bout = jnp.zeros((c,), jnp.float32)

        def fused(x):
            return attention_block(x, g, b, wqkv, wout, bout, 32)

        def unfused(x):
            return _reference_impl(x, g, b, wqkv, wout, bout, 32)

        dt_f = timed_scan(fused, (x,))
        dt_x = timed_scan(unfused, (x,))
        floor = 3 * x.size * 2 / bw
        tot_f += n * dt_f
        tot_x += n * dt_x
        tot_floor += n * floor
        print(f"{h}x{w} c{c:<10d} x{n:2d} {dt_f * 1e3:9.3f} "
              f"{dt_x * 1e3:8.3f} {floor * 1e3:12.3f}")

    print(f"\nchain totals: fused {tot_f * 1e3:.2f} ms, "
          f"xla {tot_x * 1e3:.2f} ms, 3-pass floor {tot_floor * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
