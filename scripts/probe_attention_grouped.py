"""Same-process A/B of the batch-grouped fused attention kernels at the
UNet's small-N blocks: XLA einsum path vs fused g=1 vs grouped policy.

    python scripts/probe_attention_grouped.py [--bs 96]
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

from dddpm_tpu.ops.pallas import attention_block as ab  # noqa: E402


def timed(fn, args, scan_len=100):
    @jax.jit
    def chain(*a):
        def body(c, _):
            return fn(*((c,) + a[1:])), None
        y, _ = lax.scan(body, a[0], None, length=scan_len)
        return jnp.sum(y[..., :1].astype(jnp.float32))

    _ = float(chain(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / scan_len)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    args = p.parse_args()
    bs, hidden = args.bs, 128

    shapes = [(16, 16, 256), (32, 32, 256), (64, 64, 128), (64, 64, 256)]
    for h, w, c in shapes:
        n = h * w
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (bs, n, c), jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        wqkv = (jax.random.normal(key, (c, 3 * hidden)) * 0.05
                ).astype(jnp.bfloat16)
        wout = (jax.random.normal(key, (hidden, c)) * 0.05
                ).astype(jnp.bfloat16)
        bout = jnp.zeros((c,), jnp.float32)

        dt_xla = timed(lambda x: ab._reference_impl(
            x, g, b, wqkv, wout, bout, 32), (x,))
        ab._FORCE_GROUP = 1
        dt_g1 = timed(lambda x: ab._fused_forward(
            x, g, b, wqkv, wout, bout, 32), (x,))
        ab._FORCE_GROUP = None
        dt_pol = timed(lambda x: ab._fused_forward(
            x, g, b, wqkv, wout, bout, 32) + 0.0, (x,))
        target = 8192 if c <= 128 else 4096
        gg = max(g_ for g_ in (8, 4, 2, 1) if bs % g_ == 0
                 and g_ * n <= target) if n <= target else 1
        print(f"{h}x{w} c{c} bs{bs}: XLA {dt_xla*1e3:7.3f}  fused-g1 "
              f"{dt_g1*1e3:7.3f}  grouped(g={gg}) {dt_pol*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
