"""Micro-benchmark of one UNet eval (the sampling chain's unit of work).

Chains eval outputs into inputs (eps has the same shape as x) so device
execution is strictly serialized — trustworthy per-eval timing without
the full 1000-step compile.

    python scripts/bench_unet.py [--batch 16] [--latent 128] [--ch 8]
        [--iters 20] [--variant base|no_attn|no_gn32|pallas_attn]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--ch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--variant", default="base",
                   choices=["base", "pallas_attn"])
    p.add_argument("--peak-tflops", type=float, default=197.0)
    args = p.parse_args()

    from dddpm_tpu.models.unet import Unet

    net = Unet(dim=args.dim, in_channels=args.ch, dim_mults=(1, 2, 2, 2),
               dropout=0.1, dtype=jnp.bfloat16,
               use_pallas=(args.variant == "pallas_attn"))
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, args.latent, args.latent, args.ch))
    t = jnp.full((args.batch,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    f = jax.jit(lambda p, x, t: net.apply(p, x, t))
    lowered = f.lower(params, x, t)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", 0.0)

    out = f(params, x, t)
    _ = float(jnp.sum(out))  # full sync (axon block_until_ready is lazy)

    start = time.perf_counter()
    y = x
    for _ in range(args.iters):
        y = f(params, y, t)  # serialize: output feeds next input
    _ = float(jnp.sum(y))    # device->host forces completion
    dt = (time.perf_counter() - start) / args.iters

    tflops = flops / dt / 1e12
    print(f"variant={args.variant} shape=({args.batch},{args.latent},"
          f"{args.latent},{args.ch}) dim={args.dim}")
    print(f"per-eval: {dt * 1e3:.2f} ms  {flops / 1e9:.0f} GFLOPs  "
          f"{tflops:.1f} TFLOPs ({100 * tflops / args.peak_tflops:.0f}% peak)")
    print(f"implied chain throughput: {args.batch / (dt * 1000):.2f} imgs/sec "
          f"(1000 steps)")


if __name__ == "__main__":
    main()
