"""Tile-size sweep for the fused attention block at the dominant
128^2 c128 shape (bs 96): measures how per-grid-step overhead scales.

    python scripts/probe_attention_tiles.py
"""
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
    bs, h, w, c = 96, 128, 128, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, h * w, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    wqkv = (jax.random.normal(key, (c, 384), jnp.float32) * 0.05
            ).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (128, c), jnp.float32) * 0.05
            ).astype(jnp.bfloat16)
    bout = jnp.zeros((c,), jnp.float32)

    orig = ab._pick_tile
    for target in (2048, 4096, 8192, 16384):
        # swallow the call site's explicit target so the sweep wins
        ab._pick_tile = lambda n, target=None, t=target: orig(n, t)
        try:
            dt = timed_scan(
                lambda xx: ab.attention_block(xx, g, b, wqkv, wout, bout, 32),
                (x,))
            steps = 2 * bs * (h * w // min(h * w, target))
            print(f"tile {target:6d}: {dt * 1e3:7.3f} ms "
                  f"({steps} grid steps, {dt / steps * 1e6:.2f} us/step)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tile {target:6d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            ab._pick_tile = orig


if __name__ == "__main__":
    main()
