"""Training-step throughput benchmark (imgs/sec/chip).

Times the full jitted train step (grad-accum x2, clip, Adam, EMA) on
the CIFAR-10 DDPM config or the dDDPM 256^2 config.

    python scripts/bench_train.py [--config cifar|celeba256] [--batch 32]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


CONFIGS = {
    "cifar": {
        "model": "ddpm", "dataset": "cifar10", "image_size": 32,
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
    },
    "celeba256": {
        "model": "dddpm", "dataset": "celeba_hq", "image_size": 256,
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
        "unet_in": 8, "n_downsamples": 3,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 64, "d_n_blocks": 3, "u_n_blocks": 3,
        "ae_loss": True, "t_rec_max": 100, "force_latent": True,
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="cifar", choices=list(CONFIGS))
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--pallas-resample", action="store_true",
                   help="use the fused whole-ConvResBlock kernels for "
                        "the resampler (A/B vs XLA)")
    p.add_argument("--no-recon-compact", action="store_true",
                   help="disable the gather-compacted recon branch "
                        "(A/B vs the dense t-gated recon loss)")
    args = p.parse_args()

    from dddpm_tpu.models.factory import build_model, get_color_channels
    from dddpm_tpu.train.state import (
        create_optimizer, create_train_state, make_train_step,
    )

    config = dict(CONFIGS[args.config])
    config.update({
        "batch_size": args.batch, "T": 1000, "loss_type": "simple",
        "beta_schedule": "linear", "loss_flat": "sum",
        "compute_dtype": "bfloat16", "lr": 2e-4,
    })
    if args.pallas_resample:
        config["use_pallas_resample"] = True
    if args.no_recon_compact:
        config["recon_compact"] = False
    net, process, init_fn, config = build_model(config)
    tx = create_optimizer(config["lr"])
    state = create_train_state(config, init_fn, jax.random.PRNGKey(0), tx)
    step_fn = jax.jit(make_train_step(process, tx, grad_accum=2,
                                      ema_decay=0.995), donate_argnums=0)

    c = get_color_channels(config["dataset"])
    s = config["image_size"]
    batch = jax.random.uniform(jax.random.PRNGKey(1),
                               (2, args.batch, s, s, c),
                               minval=-1.0, maxval=1.0)

    state, metrics = step_fn(state, batch)  # compile
    _ = float(metrics["train_obj"])
    start = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["train_obj"])        # sync
    dt = (time.perf_counter() - start) / args.iters

    imgs = 2 * args.batch
    print(f"config={args.config} bs={args.batch} (x2 accum): "
          f"{dt * 1e3:.1f} ms/step, {imgs / dt:.1f} imgs/sec/chip")


if __name__ == "__main__":
    main()
