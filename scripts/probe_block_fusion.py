"""A/B probe: fold Block1's GroupNorm+Mish (+ time bias) into Block2's
conv as a Pallas prologue (VERDICT r2 item 3's named lever).

Measures the ResnetBlock inner seam — conv1 -> GN+mish+tbias -> conv2
-> GN+mish — at the x2 sampling chain's dominant shapes, the reliable
way (lax.scan inside one jit + scalar fetch).  Variant A is the
committed XLA path; variant B computes GN stats with XLA, folds them to
per-(batch, channel) scale/shift, and runs conv2 as
`conv3x3_fused(..., scale, shift, post_bias)` so the intermediate
activation tensor never makes an HBM round trip.

    python scripts/probe_block_fusion.py
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

from dddpm_tpu.ops.math import mish
from dddpm_tpu.ops.pallas.conv3x3 import conv3x3_fused

EPS = 1e-5
GROUPS = 8


def conv3x3(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def gn_mish(x, g, b):
    """f32 GroupNorm(8) + mish, rounded back to x.dtype (the Block)."""
    bs, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(bs, h, w, GROUPS, c // GROUPS)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + EPS)
    y = y.reshape(bs, h, w, c) * g + b
    return mish(y).astype(x.dtype)


def gn_fold(x, g, b):
    """GN stats of x -> per-(batch, channel) scale/shift, f32."""
    bs, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(bs, h, w, GROUPS, c // GROUPS)
    mean = xf.mean(axis=(1, 2, 4))                       # (B, G)
    var = ((xf - mean[:, None, None, :, None]) ** 2).mean(axis=(1, 2, 4))
    rep = c // GROUPS
    mean = jnp.repeat(mean, rep, axis=1)                 # (B, C)
    inv = jnp.repeat(lax.rsqrt(var + EPS), rep, axis=1)
    scale = inv * g
    shift = b - mean * scale
    return scale, shift


def seam_xla(x, p):
    c1 = conv3x3(x, p["w1"], p["b1"])
    h = gn_mish(c1, p["g1"], p["be1"]) + p["tb"][:, None, None, :]
    c2 = conv3x3(h, p["w2"], p["b2"])
    return gn_mish(c2, p["g2"], p["be2"])


def seam_fused(x, p):
    c1 = conv3x3(x, p["w1"], p["b1"])
    scale, shift = gn_fold(c1, p["g1"], p["be1"])
    c2 = conv3x3_fused(c1, p["w2"], p["b2"], scale=scale, shift=shift,
                       post_bias=p["tb"])
    return gn_mish(c2, p["g2"], p["be2"])


def make_params(key, c, bs, dtype):
    ks = jax.random.split(key, 8)
    s = 0.05
    return {
        "w1": jax.random.normal(ks[0], (3, 3, c, c), dtype) * s,
        "b1": jax.random.normal(ks[1], (c,), dtype) * s,
        "w2": jax.random.normal(ks[2], (3, 3, c, c), dtype) * s,
        "b2": jax.random.normal(ks[3], (c,), dtype) * s,
        "g1": 1.0 + 0.1 * jax.random.normal(ks[4], (c,), jnp.float32),
        "be1": 0.1 * jax.random.normal(ks[5], (c,), jnp.float32),
        "g2": 1.0 + 0.1 * jax.random.normal(ks[6], (c,), jnp.float32),
        "be2": 0.1 * jax.random.normal(ks[7], (c,), jnp.float32),
        "tb": (jax.random.normal(ks[0], (bs, c), jnp.float32) * s
               ).astype(dtype),
    }


def timed(fn, x, p, scan_len=50):
    @jax.jit
    def chain(x, p):
        def body(y, _):
            return fn(y, p), None
        y, _ = lax.scan(body, x, None, length=scan_len)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(chain(x, p))
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        _ = float(chain(x, p))
        best = min(best, (time.perf_counter() - start) / scan_len)
    return best


def main():
    # equivalence first (bf16 tolerance)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 128),
                          jnp.bfloat16)
    p = make_params(jax.random.PRNGKey(1), 128, 2, jnp.bfloat16)
    a = np.asarray(seam_xla(x, p), np.float32)
    b = np.asarray(seam_fused(x, p), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-8)
    print(f"equivalence: max rel err {err:.2e}", flush=True)
    assert err < 3e-2, err

    for c, hw, bs in [(128, 128, 96), (256, 64, 96), (256, 32, 96)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (bs, hw, hw, c),
                              jnp.bfloat16)
        p = make_params(jax.random.PRNGKey(1), c, bs, jnp.bfloat16)
        ta = timed(seam_xla, x, p)
        tb = timed(seam_fused, x, p)
        print(f"c{c} {hw}^2 bs{bs}: XLA {ta * 1e3:7.3f} ms   "
              f"fused {tb * 1e3:7.3f} ms   "
              f"delta {100 * (ta - tb) / ta:+5.1f}%", flush=True)


if __name__ == "__main__":
    main()
