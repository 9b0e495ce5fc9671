"""Same-process A/B: two-pass vs single-pass resident-block attention
kernel, isolated per production shape and in-graph for the full x2-chain
UNet eval (VERDICT r4 item 1).

    python scripts/probe_attention_1pass.py [--bs 96] [--skip-unet]
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


def timed(fn, args, scan_len=50):
    return timed_scan(fn, args, scan_len)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--skip-unet", action="store_true")
    args = p.parse_args()
    bs = args.bs
    hidden = 128

    shapes = [(128, 128, 128), (64, 64, 256), (32, 32, 256)]
    for h, w, c in shapes:
        n = h * w
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (bs, n, c), jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        wqkv = (jax.random.normal(key, (c, 3 * hidden), jnp.float32) * 0.05
                ).astype(jnp.bfloat16)
        wout = (jax.random.normal(key, (hidden, c), jnp.float32) * 0.05
                ).astype(jnp.bfloat16)
        bout = jnp.zeros((c,), jnp.float32)

        # numeric agreement on-device first
        ab._FORCE_ONE_PASS = False
        y2 = jax.jit(lambda x: ab.attention_block(
            x, g, b, wqkv, wout, bout, 32))(x)
        ab._FORCE_ONE_PASS = True
        y1 = jax.jit(lambda x: ab.attention_block(
            x, g, b, wqkv, wout, bout, 32) + 0.0)(x)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))

        ab._FORCE_ONE_PASS = False
        dt2 = timed(lambda x: ab.attention_block(
            x, g, b, wqkv, wout, bout, 32), (x,))
        ab._FORCE_ONE_PASS = True
        dt1 = timed(lambda x: ab.attention_block(
            x, g, b, wqkv, wout, bout, 32), (x,))
        floor = 2 * bs * n * c * 2 / 900e9 * 1e3
        print(f"{h}x{w} c{c} bs{bs}: two-pass {dt2*1e3:7.3f} ms  "
              f"1-pass {dt1*1e3:7.3f} ms  ({(1-dt1/dt2)*100:+.1f}%)  "
              f"r/w floor {floor:.2f} ms  |Δ|max {err:.2e}")

    if args.skip_unet:
        return

    # full x2-chain UNet eval in-graph A/B (the headline hot loop)
    from dddpm_tpu.models.unet import Unet
    net = Unet(dim=128, in_channels=8, dim_mults=(1, 2, 2, 2),
               dropout=0.1, dtype=jnp.bfloat16, use_pallas=True)
    xu = jax.random.normal(jax.random.PRNGKey(0), (bs, 128, 128, 8))
    tu = jnp.full((bs,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), xu[:2], tu[:2])
    print("in-graph UNet eval A/B:")
    for force in (False, True):
        ab._FORCE_ONE_PASS = force
        dt = timed(lambda xu: net.apply(params, xu, tu), (xu,), scan_len=20)
        label = "1-pass  " if force else "two-pass"
        print(f"  {label}: {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
