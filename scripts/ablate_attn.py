"""Fine-grained ablation inside the attention block: norm vs qkv conv
vs attention core vs output conv.

    python scripts/ablate_attn.py [--iters 15]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed_eval(make, iters):
    net = make()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128, 128, 8))
    t = jnp.full((16,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)
    f = jax.jit(lambda p, x, t: net.apply(p, x, t))
    _ = float(jnp.sum(f(params, x, t)))
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

    # LayerNorm in bf16 (no f32 materialization)
    orig_ln = B.ChannelLayerNorm.__call__

    def ln_bf16(self, x):
        # flax LayerNorm in bf16 (submodule creation works in patched
        # methods; self.param does not) — equivalent traffic profile
        return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)

    B.ChannelLayerNorm.__call__ = nn.compact(ln_bf16)
    try:
        results["ln_bf16"] = timed_eval(make, args.iters)
    finally:
        B.ChannelLayerNorm.__call__ = orig_ln

    # no LayerNorm at all
    B.ChannelLayerNorm.__call__ = nn.compact(lambda self, x: x)
    try:
        results["no_ln"] = timed_eval(make, args.iters)
    finally:
        B.ChannelLayerNorm.__call__ = orig_ln

    # attention core -> pass-through of v (keeps convs + norm + splits)
    orig_attn = B.LinearAttention.__call__

    def attn_v_only(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = B.conv1x1(hidden * 3, self.dim, use_bias=False,
                        dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        v = qkv[:, :, 2]
        out = v.reshape(b, h, w, hidden)
        return B.conv1x1(self.dim, hidden, dtype=self.dtype,
                         name="to_out")(out)

    B.LinearAttention.__call__ = nn.compact(attn_v_only)
    try:
        results["attn_core_off"] = timed_eval(make, args.iters)
    finally:
        B.LinearAttention.__call__ = orig_attn

    # pallas attention core
    make_pl = lambda: Unet(dim=128, in_channels=8, dim_mults=(1, 2, 2, 2),
                           dropout=0.1, dtype=jnp.bfloat16, use_pallas=True)
    results["pallas_attn"] = timed_eval(make_pl, args.iters)

    base = results["base"]
    for k, v in results.items():
        d = base - v
        print(f"{k:16s} {v * 1e3:7.2f} ms  ({100 * d / base:+5.1f}%)")


if __name__ == "__main__":
    main()
