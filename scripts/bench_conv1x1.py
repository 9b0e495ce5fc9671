"""Isolate the attention block's 1x1 conv + split costs at the L1 shape.

    python scripts/bench_conv1x1.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn


def timeit(f, *args, iters=30):
    out = f(*args)
    _ = jax.tree.map(lambda t: float(jnp.sum(t)), out)
    start = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = jax.tree.map(lambda t: float(jnp.sum(t)), out)
    return (time.perf_counter() - start) / iters


def main():
    B, H, W, C = 16, 128, 128, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C), jnp.bfloat16)

    # conv_general_dilated 1x1 (what nn.Conv emits)
    conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, C, 3 * C), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t_conv = timeit(conv, x, k)

    # plain matmul over flattened tokens
    mm = jax.jit(lambda x, k: (x.reshape(-1, C) @ k).reshape(
        B, H, W, 3 * C))
    t_mm = timeit(mm, x, k)

    # matmul + qkv split (the reshape/slice pattern in LinearAttention)
    def mm_split(x, k):
        qkv = (x.reshape(-1, C) @ k).reshape(B, H * W, 3, 4, 32)
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    t_split = timeit(jax.jit(mm_split), x, k)

    # split via reshape to (.., 3, 128) on the lane axis instead
    def mm_split_fold(x, k):
        qkv = (x.reshape(-1, C) @ k).reshape(B, H * W, 3, 128)
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    t_fold = timeit(jax.jit(mm_split_fold), x, k)

    # three separate matmuls (no split needed at all)
    k3 = k.reshape(C, 3, C)
    def mm3(x, k3):
        xt = x.reshape(-1, C)
        return (xt @ k3[:, 0], xt @ k3[:, 1], xt @ k3[:, 2])
    t_mm3 = timeit(jax.jit(mm3), x, k3)

    flops = 2 * B * H * W * C * 3 * C
    for name, t in [("conv1x1", t_conv), ("matmul", t_mm),
                    ("matmul+split(3,4,32)", t_split),
                    ("matmul+split(3,128)", t_fold),
                    ("3 matmuls", t_mm3)]:
        print(f"{name:22s} {t * 1e3:6.2f} ms  {flops / t / 1e12:6.1f} TFLOPs")


if __name__ == "__main__":
    main()
