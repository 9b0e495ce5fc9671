"""Per-resolution in-graph cost attribution for the x2 sampling UNet.

Each stage of the 128^2-latent UNet (bs 96 bf16) is timed as its own
scan-in-one-jit subgraph (the only trustworthy timing through the axon
tunnel, see probe_unet_split.py).  Stages are built from the real
blocks so XLA's intra-stage fusion matches the full graph; the only
distortion is the stage-boundary tensor r/w, which is the same tensor
the full graph also round-trips at that seam.

Stages (all channel/shape-closed so the scan carry works):

  s128  RB(8->128) + RB(128) + attn c128 @128^2 + final Block + 1x1->8
  s64   RB(128->256) + RB(256) + attn c256  |  up: RB(512->128) + RB(128) + attn c128
  s32   RB(256) + RB(256) + attn            |  up: RB(512->256) + RB(256) + attn
  s16   L4(RB,RB,attn) + mid(RB,attn,RB) + up1(RB(512->256),RB,attn)
  scale Downsample convs (128/64/32) + Upsample convTs (16/32/64),
        each closed with a cheap reshape pool/slice (glue printed).

The analytic MXU floor (@197 TF nominal) for each stage's convs is
printed next to the measurement; attention floors come from
BENCH_NOTES' per-pass table.

    python scripts/probe_stage_split.py [--bs 96] [--iters 20]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()

from dddpm_tpu.models.blocks import (  # noqa: E402
    Block, Downsample, PreNormLinearAttention, ResnetBlock, Upsample,
    conv1x1)

PEAK = 197e12


def conv_floor_ms(bs, h, taps_cin_cout):
    """Sum of MXU-geometry floors (@197 TF) for a list of convs at h^2."""
    total = 0.0
    for taps, cin, cout in taps_cin_cout:
        k = taps * cin
        lane = min(cout, 128) / 128
        depth = k / (int(np.ceil(k / 128)) * 128)
        fl = 2 * bs * h * h * taps * cin * cout
        total += fl / (PEAK * lane * depth)
    return total * 1e3


def timed(fn, params, x, t_emb, iters):
    return timed_scan(lambda c, p, te: fn(p, c, te),
                      (x, params, t_emb), iters) * 1e3


class S128(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        y = ResnetBlock(8, 128, dtype=self.dtype)(x, t_emb)
        y = ResnetBlock(128, 128, dtype=self.dtype)(y, t_emb)
        y = PreNormLinearAttention(128, dtype=self.dtype, use_pallas=True)(y)
        y = Block(128, 128, dtype=self.dtype)(y)
        return conv1x1(8, 128, dtype=self.dtype)(y)


class S64(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        y = ResnetBlock(128, 256, dtype=self.dtype)(x, t_emb)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        skip = PreNormLinearAttention(256, dtype=self.dtype,
                                      use_pallas=True)(y)
        y = ResnetBlock(512, 128, dtype=self.dtype)(skip, t_emb, skip=skip)
        y = ResnetBlock(128, 128, dtype=self.dtype)(y, t_emb)
        return PreNormLinearAttention(128, dtype=self.dtype,
                                      use_pallas=True)(y)


class S32(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        y = ResnetBlock(256, 256, dtype=self.dtype)(x, t_emb)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        skip = PreNormLinearAttention(256, dtype=self.dtype,
                                      use_pallas=True)(y)
        y = ResnetBlock(512, 256, dtype=self.dtype)(skip, t_emb, skip=skip)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        return PreNormLinearAttention(256, dtype=self.dtype,
                                      use_pallas=True)(y)


class S16(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        y = ResnetBlock(256, 256, dtype=self.dtype)(x, t_emb)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        skip = PreNormLinearAttention(256, dtype=self.dtype,
                                      use_pallas=True)(y)
        y = ResnetBlock(256, 256, dtype=self.dtype)(skip, t_emb)
        y = PreNormLinearAttention(256, dtype=self.dtype, use_pallas=True)(y)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        y = ResnetBlock(512, 256, dtype=self.dtype)(y, t_emb, skip=skip)
        y = ResnetBlock(256, 256, dtype=self.dtype)(y, t_emb)
        return PreNormLinearAttention(256, dtype=self.dtype,
                                      use_pallas=True)(y)


class Scalers(nn.Module):
    """All six resolution-change convs, glue-closed back to 128^2 c128."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        d1 = Downsample(128, dtype=self.dtype)(x)            # 64^2 c128
        d1 = jnp.concatenate([d1, d1], -1)                   # c256 glue
        d2 = Downsample(256, dtype=self.dtype)(d1)           # 32^2 c256
        d3 = Downsample(256, dtype=self.dtype)(d2)           # 16^2 c256
        u1 = Upsample(256, dtype=self.dtype)(d3)             # 32^2 c256
        u2 = Upsample(256, dtype=self.dtype)(u1)             # 64^2 c256
        u2 = u2[..., :128]                                   # c128 glue
        u3 = Upsample(128, dtype=self.dtype)(u2)             # 128^2 c128
        return u3


class ScalersGlue(nn.Module):
    """Just the glue ops of Scalers (concat + slice + shape plumbing)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        d1 = x[:, ::2, ::2]
        d1 = jnp.concatenate([d1, d1], -1)
        d2 = d1[:, ::2, ::2]
        d3 = d2[:, ::2, ::2]
        u1 = jnp.repeat(jnp.repeat(d3, 2, 1), 2, 2)
        u2 = jnp.repeat(jnp.repeat(u1, 2, 1), 2, 2)[..., :128]
        u3 = jnp.repeat(jnp.repeat(u2, 2, 1), 2, 2)
        return u3.astype(x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    bs = args.bs
    key = jax.random.PRNGKey(0)
    t_emb = jax.random.normal(key, (bs, 128), jnp.float32)

    stages = [
        ("s128", S128(), (bs, 128, 128, 8),
         [(9, 8, 128), (9, 128, 128)] + [(9, 128, 128)] * 2
         + [(1, 8, 128)] + [(9, 128, 128)] + [(1, 128, 8)],
         "attn floors: 128^2 c128 = 3.69"),
        ("s64", S64(), (bs, 64, 64, 128),
         [(9, 128, 256), (1, 128, 256)] + [(9, 256, 256)] * 3
         + [(9, 512, 128), (1, 512, 128)] + [(9, 128, 128)] * 3,
         "attn floors: 64^2 c256 = 1.69, 64^2 c128 ~ 0.93"),
        ("s32", S32(), (bs, 32, 32, 256),
         [(9, 256, 256)] * 7 + [(9, 512, 256), (1, 512, 256)]
         + [(9, 256, 256)] * 2,
         "attn floors: 2x 32^2 c256 ~ 2x 0.45"),
        ("s16", S16(), (bs, 16, 16, 256),
         [(9, 256, 256)] * 11 + [(9, 512, 256), (1, 512, 256)]
         + [(9, 256, 256)],
         "attn floors: 3x 16^2 c256 ~ 3x 0.12"),
        ("scalers", Scalers(), (bs, 128, 128, 128),
         [(9, 128, 128)], "down convs s2 + up convTs (floors below)"),
        ("scalers_glue", ScalersGlue(), (bs, 128, 128, 128), [],
         "pure glue (subtract from scalers)"),
    ]

    total = 0.0
    for name, net, shape, convs, note in stages:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        params = net.init(jax.random.PRNGKey(1), x, t_emb)
        fn = lambda p, c, te, net=net: net.apply(p, c, te)
        ms = timed(fn, params, x, t_emb, args.iters)
        h = shape[1]
        floor = conv_floor_ms(bs, h, convs) if convs else 0.0
        total += ms
        print(f"{name:13s} {ms:7.2f} ms   conv floor @197 {floor:6.2f} ms"
              f"   ({note})", flush=True)
    print(f"sum of stages {total:7.2f} ms (full eval ~54; seam r/w distorts)")

    # scaling-conv floors: stride-2 3x3 down = 9 taps at out positions;
    # 4x4 convT up = 4 effective taps per out position
    f = (conv_floor_ms(bs, 64, [(9, 128, 128)])
         + conv_floor_ms(bs, 32, [(9, 256, 256)])
         + conv_floor_ms(bs, 16, [(9, 256, 256)])
         + conv_floor_ms(bs, 32, [(4, 256, 256)])
         + conv_floor_ms(bs, 64, [(4, 256, 256)])
         + conv_floor_ms(bs, 128, [(4, 128, 128)]))
    print(f"scaler conv floor @197: {f:6.2f} ms")


if __name__ == "__main__":
    main()
