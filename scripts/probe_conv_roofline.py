"""Achieved TFLOPs of the individual hot convs, measured the reliable
way (lax.scan inside one jit + scalar fetch; see probe_unet_split.py).

    python scripts/probe_conv_roofline.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, x, w, scan_len=100):
    @jax.jit
    def chain(x, w):
        def body(y, _):
            return fn(y, w), None
        y, _ = lax.scan(body, x, None, length=scan_len)
        return jnp.sum(y)

    _ = float(chain(x, w))
    start = time.perf_counter()
    _ = float(chain(x, w))
    return (time.perf_counter() - start) / scan_len


def conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    bs = 16
    cases = [
        ("conv3x3 128^2 c128", (bs, 128, 128, 128), (3, 3, 128, 128)),
        ("conv3x3  64^2 c256", (bs, 64, 64, 256), (3, 3, 256, 256)),
        ("conv3x3  32^2 c256", (bs, 32, 32, 256), (3, 3, 256, 256)),
        ("conv3x3  16^2 c256", (bs, 16, 16, 256), (3, 3, 256, 256)),
    ]
    for name, xs, ws in cases:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), ws, jnp.bfloat16) * 0.02
        dt = timed(conv3x3, x, w)
        flops = 2 * xs[0] * xs[1] * xs[2] * 9 * ws[2] * ws[3]
        print(f"{name}: {dt * 1e3:6.3f} ms  {flops / dt / 1e12:6.1f} TFLOPs",
              flush=True)


if __name__ == "__main__":
    main()
