"""Ablation timing: which UNet pieces cost what at the 128^2-latent
sampling configuration.

Patches block implementations (identity attention, bf16/no GroupNorm,
resize-upsample) and times one eval each, to direct fusion work at the
actual bottleneck.

    python scripts/ablate_unet.py [--iters 15]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed_eval(net_factory, iters: int):
    net = net_factory()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128, 128, 8))
    t = jnp.full((16,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)
    f = jax.jit(lambda p, x, t: net.apply(p, x, t))
    out = f(params, x, t)
    _ = float(jnp.sum(out))
    start = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(params, y, t)
    _ = float(jnp.sum(y))
    return (time.perf_counter() - start) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args()

    import dddpm_tpu.models.blocks as B
    from dddpm_tpu.models.unet import Unet

    make = lambda: Unet(dim=128, in_channels=8, dim_mults=(1, 2, 2, 2),
                        dropout=0.1, dtype=jnp.bfloat16)

    results = {}
    results["base"] = timed_eval(make, args.iters)

    # --- attention -> identity
    orig_attn_call = B.PreNormLinearAttention.__call__

    def identity_attn(self, x):
        return x

    B.PreNormLinearAttention.__call__ = nn.compact(identity_attn)
    try:
        results["no_attention"] = timed_eval(make, args.iters)
    finally:
        B.PreNormLinearAttention.__call__ = orig_attn_call

    # --- GroupNorm fully in bf16 (no f32 cast round-trip)
    orig_block_call = B.Block.__call__

    def block_bf16_gn(self, x):
        x = B.conv3x3(self.dim_out, self.dim, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return B.mish(x)

    B.Block.__call__ = nn.compact(block_bf16_gn)
    try:
        results["gn_bf16"] = timed_eval(make, args.iters)
    finally:
        B.Block.__call__ = orig_block_call

    # --- no GroupNorm at all (upper bound of norm cost)
    def block_no_gn(self, x):
        x = B.conv3x3(self.dim_out, self.dim, dtype=self.dtype)(x)
        return B.mish(x)

    B.Block.__call__ = nn.compact(block_no_gn)
    try:
        results["no_gn"] = timed_eval(make, args.iters)
    finally:
        B.Block.__call__ = orig_block_call

    # --- Upsample as resize+conv3x3 instead of ConvTranspose
    orig_up_call = B.Upsample.__call__

    def up_resize(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return B.conv3x3(self.dim, self.dim, dtype=self.dtype)(x)

    B.Upsample.__call__ = nn.compact(up_resize)
    try:
        results["resize_upsample"] = timed_eval(make, args.iters)
    finally:
        B.Upsample.__call__ = orig_up_call

    base = results["base"]
    for k, v in results.items():
        delta = base - v
        print(f"{k:18s} {v * 1e3:7.2f} ms  (saves {delta * 1e3:+6.2f} ms, "
              f"{100 * delta / base:+5.1f}%)")


if __name__ == "__main__":
    main()
