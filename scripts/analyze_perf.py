"""Roofline analysis of the sampling hot path.

Prints compiled FLOPs / bytes for one UNet eval and for the full
1000-step chain, plus achieved vs peak utilization when timed on the
current backend.

    python scripts/analyze_perf.py [--image-size 256] [--downsample 1]
        [--batch 16] [--time]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample", type=int, default=1)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--time", action="store_true")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip peak bf16 TFLOPs (v5e: 197)")
    args = p.parse_args()

    from dddpm_tpu.models.factory import build_model

    config = {
        "model": "dddpm" if args.downsample else "ddpm",
        "dataset": "celeba_hq", "image_size": args.image_size,
        "batch_size": args.batch, "T": 1000, "loss_type": "simple",
        "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
        "unet_in": 8, "n_downsamples": args.downsample,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 64, "d_n_blocks": 3, "u_n_blocks": 3,
        "ae_loss": True, "t_rec_max": 100, "force_latent": True,
        "compute_dtype": "bfloat16",
    }
    net, process, init_fn, config = build_model(config)
    params = init_fn(jax.random.PRNGKey(0))

    z = args.image_size // (2 ** args.downsample)
    shape = ((args.batch, z, z, 8) if args.downsample
             else (args.batch, args.image_size, args.image_size, 3))
    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((args.batch,), jnp.int32)

    eps_fn = jax.jit(lambda p, x, t: process.eps_fn(p, x, t, None, False))
    lowered = eps_fn.lower(params, x, t)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    print(f"UNet eval @ {shape}: {flops / 1e9:.1f} GFLOPs, "
          f"{bytes_acc / 1e6:.1f} MB accessed, "
          f"arithmetic intensity {flops / max(bytes_acc, 1):.1f} flop/byte")
    chain_tflops = flops * 1000 / 1e12
    print(f"full 1000-step chain: {chain_tflops:.1f} TFLOPs per batch of "
          f"{args.batch} ({chain_tflops / args.batch:.2f} TFLOPs/img)")
    ideal = chain_tflops / args.peak_tflops
    print(f"speed-of-light batch time @ {args.peak_tflops} TFLOPs: "
          f"{ideal:.1f}s -> {args.batch / ideal:.2f} imgs/sec")

    if args.time:
        # scan-in-jit + scalar fetch: the only trustworthy timing on the
        # axon tunnel (per-dispatch block_until_ready returns early)
        from jax import lax

        n = 20

        @jax.jit
        def chain(p, x, t):
            def body(y, _):
                return process.eps_fn(p, y, t, None, False), None
            y, _ = lax.scan(body, x, None, length=n)
            return jnp.sum(y)

        _ = float(chain(params, x, t))      # compile + warmup
        start = time.perf_counter()
        _ = float(chain(params, x, t))
        dt = (time.perf_counter() - start) / n
        ach = flops / dt / 1e12
        print(f"measured UNet eval: {dt * 1e3:.1f} ms -> {ach:.1f} TFLOPs "
              f"({100 * ach / args.peak_tflops:.0f}% of peak)")


if __name__ == "__main__":
    main()
