"""UNet time-split probe for the real TPU.

Timing methodology (IMPORTANT): the axon tunnel makes per-dispatch
wall-clock timings meaningless — async dispatch + block_until_ready
return long before the device finishes small programs.  The only
trustworthy measurement is a lax.scan of N evals inside ONE jitted
program, timed around an explicit scalar fetch.  That is exactly the
shape of the real sampling hot loop, too.

    python scripts/probe_unet_split.py --variant base
    python scripts/probe_unet_split.py --all
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VARIANTS = ("base", "convtranspose", "no_gnmish", "no_attn",
            "linear_mish", "einsum_attn")


def timed_scan_eval(scan_len: int = 50, bs: int = 16):
    from dddpm_tpu.models.unet import Unet

    net = Unet(dim=128, in_channels=8, dim_mults=(1, 2, 2, 2),
               dropout=0.1, dtype=jnp.bfloat16,
               use_pallas=jax.default_backend() != "cpu")
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, 128, 128, 8))
    t = jnp.full((bs,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    @jax.jit
    def chain(p, x, t):
        def body(y, _):
            return net.apply(p, y, t), None
        y, _ = lax.scan(body, x, None, length=scan_len)
        return jnp.sum(y)

    _ = float(chain(params, x, t))          # compile + warmup
    start = time.perf_counter()
    _ = float(chain(params, x, t))          # fetch forces completion
    return (time.perf_counter() - start) / scan_len


def apply_variant(name: str):
    import dddpm_tpu.models.blocks as B

    if name == "convtranspose":
        # the nn.ConvTranspose module path (what Upsample used before
        # the subpixel decomposition)
        def up_convt(self, x):
            return nn.ConvTranspose(
                self.dim, kernel_size=(4, 4), strides=(2, 2),
                padding="SAME", dtype=self.dtype)(x)
        B.Upsample.__call__ = nn.compact(up_convt)
    elif name == "no_gnmish":
        def block_plain(self, x):
            return B.conv3x3(self.dim_out, self.dim, dtype=self.dtype)(x)
        B.Block.__call__ = nn.compact(block_plain)
    elif name == "no_attn":
        def identity_attn(self, x):
            return x
        B.PreNormLinearAttention.__call__ = nn.compact(identity_attn)
    elif name == "einsum_attn":
        orig = B.PreNormLinearAttention.__call__
        def einsum_attn(self, x):
            return x + self.attn(self.norm(x))
        einsum_attn.__wrapped__ = orig
        B.PreNormLinearAttention.__call__ = einsum_attn
    elif name == "linear_mish":
        # replace transcendental mish with a cheap clip op to isolate
        # VPU transcendental cost (keeps GN reductions + traffic)
        import dddpm_tpu.ops.math as M
        cheap = lambda x: x * jnp.clip(0.5 + 0.25 * x, 0.0, 1.0)
        M.mish = cheap
        B.mish = cheap
    elif name != "base":
        raise SystemExit(f"unknown variant {name}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="base", choices=VARIANTS)
    p.add_argument("--scan-len", type=int, default=50)
    p.add_argument("--bs", type=int, default=16)
    args = p.parse_args()
    apply_variant(args.variant)
    dt = timed_scan_eval(args.scan_len, args.bs)
    print(f"{args.variant:14s} {dt * 1e3:7.2f} ms/eval  (bs {args.bs}, "
          f"scan {args.scan_len})", flush=True)


if __name__ == "__main__":
    main()
