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

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()

from dddpm_tpu.ops.pallas import attention_block as ab  # noqa: E402


def timed(fn, args, scan_len=100):
    return timed_scan(fn, args, scan_len)


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
        # bypass the N<=512 XLA short-circuit so the fused kernels are
        # actually measured at 16^2 too (the short-circuit predates
        # batch grouping; without this the "fused" columns would
        # silently re-measure the XLA path there)
        saved_cap = ab.XLA_PATH_MAX_TOKENS
        ab.XLA_PATH_MAX_TOKENS = 0
        ab._FORCE_GROUP = 1
        dt_g1 = timed(lambda x: ab._fused_forward(
            x, g, b, wqkv, wout, bout, 32), (x,))
        ab._FORCE_GROUP = None
        dt_pol = timed(lambda x: ab._fused_forward(
            x, g, b, wqkv, wout, bout, 32) + 0.0, (x,))
        ab.XLA_PATH_MAX_TOKENS = saved_cap
        # label with the production policy itself so the printed g can
        # never drift from what the kernel actually ran
        target = 8192 if c <= 128 else 4096
        gg = ab._pick_group(bs, n, n // ab._pick_tile(n, target))
        print(f"{h}x{w} c{c} bs{bs}: XLA {dt_xla*1e3:7.3f}  fused-g1 "
              f"{dt_g1*1e3:7.3f}  grouped(g={gg}) {dt_pol*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
