"""Bulk sample generation for FID evaluation.

Reference generate_model_samples.py: loads a checkpoint (EMA weights
preferred), samples ceil(fid_samples/batch_size) batches, prints timing
stats, saves (n_batches, B, H, W, C) [0,255] npy arrays (+ latent npy
for dDDPM).  Here the sampling batch is sharded over the device mesh.

    python generate_model_samples.py --checkpoint <dir> \
        [--fid-samples 50000] [--batch-size 192] [--out samples/]
"""
import argparse
import json
import os

import numpy as np
import jax

from dddpm_tpu.models.factory import build_model
from dddpm_tpu.parallel.mesh import create_mesh, replicate
from dddpm_tpu.sample import generate_samples
from dddpm_tpu.train import checkpoint as ckpt
from dddpm_tpu.train.state import create_optimizer, create_train_state


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--fid-samples", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=192)
    p.add_argument("--out", default="results/samples")
    p.add_argument("--latent-out", default="results/samples_latent")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ddim-steps", type=int, default=None,
                   help="use strided DDIM sampling with this many steps "
                        "instead of the full ancestral chain")
    p.add_argument("--ddim-eta", type=float, default=0.0)
    p.add_argument("--chain-segments", type=int, default=1,
                   help="split the ancestral chain into N consecutive "
                        "jitted scans (bit-identical; use when one "
                        "device program would exceed the runtime's "
                        "wall-clock limit, e.g. axon kills programs "
                        "over ~45-65 s)")
    p.add_argument("--quant-conv", default="none", choices=["none", "int8"],
                   help="opt-in W8A8 quantized conv serving mode "
                        "(ops/quant.py): conv sites whose shape class "
                        "measured faster in s8 on the TPU run quantized "
                        "with calibrated activation scales. Changes "
                        "numerics (int8 rounding); default off")
    p.add_argument("--quant-calib", default="trajectory",
                   choices=["trajectory", "noise"],
                   help="activation-scale calibration: 'trajectory' runs "
                        "a small bf16 reverse chain and observes real "
                        "chain states (quality-bearing default); 'noise' "
                        "observes N(0,1) latents only (cheap bootstrap)")
    p.add_argument("--quant-calib-batch", type=int, default=4)
    p.add_argument("--prng-impl", default="threefry2x32",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG for sampling noise. threefry (default) is "
                        "the stable counter-based stream: same seed -> "
                        "same samples across JAX/XLA versions. 'rbg' uses "
                        "the TPU hardware generator (~0.25 ms/step faster "
                        "at bs 96; identical N(0,1) distribution, but the "
                        "stream is NOT guaranteed stable across software "
                        "versions — bench.py opts into it for throughput)")
    args = p.parse_args()

    config = ckpt.load_config(args.checkpoint)
    if "unet_dims" in config:
        config["unet_dims"] = tuple(config["unet_dims"])
    config["batch_size"] = args.batch_size

    net, process, init_fn, config = build_model(config)
    tx = create_optimizer(config["lr"])
    abstract = jax.eval_shape(
        lambda r: create_train_state(config, init_fn, r, tx),
        jax.random.PRNGKey(0))
    state = ckpt.restore_checkpoint(args.checkpoint, abstract)
    params = state.ema_params if config.get("ema_decay", 0) > 0 else state.params

    if args.quant_conv != "none":
        # rebuild with the quantized conv path and calibrate activation
        # scales for THIS checkpoint (the restore above used the
        # as-trained model, whose param tree the checkpoint matches)
        from dddpm_tpu.quantize import maybe_calibrate

        config["conv_quant"] = args.quant_conv
        net, process, init_fn, config = build_model(config)
        params = maybe_calibrate(
            config, net, process, dict(params),
            jax.random.PRNGKey(args.seed + 1),
            batch_size=args.quant_calib_batch, mode=args.quant_calib)
        print(f"conv_quant={args.quant_conv}: activation scales "
              f"calibrated ({args.quant_calib} mode)")

    mesh = create_mesh()
    params = replicate(params, mesh)

    name = os.path.basename(os.path.normpath(args.checkpoint))
    print(f"\nGenerating {args.fid_samples} samples from checkpoint {name}.")
    print(f"Trained for {int(state.step)} steps with configuration dict:")
    print(json.dumps({k: str(v) if isinstance(v, tuple) else v
                      for k, v in config.items()}, indent=4) + "\n")

    rng = jax.random.key(args.seed, impl=args.prng_impl)
    samples, latents, timing = generate_samples(
        process, params, mesh, rng,
        args.fid_samples, args.batch_size,
        ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta,
        chain_segments=args.chain_segments)

    print(f"Using batch size {args.batch_size}")
    print(f"Total time: {timing['total_s']}")
    print(f"Sample time: {timing['per_sample_s']}")
    print(f"Batch time: {timing['per_batch_s']}")
    print(f"Throughput: {timing['imgs_per_sec']:.2f} imgs/sec")

    os.makedirs(args.out, exist_ok=True)
    save_path = os.path.join(args.out, name)
    np.save(save_path, samples, allow_pickle=False)
    print(f"Samples saved to {save_path}")

    if latents is not None:
        os.makedirs(args.latent_out, exist_ok=True)
        save_path = os.path.join(args.latent_out, name)
        np.save(save_path, latents, allow_pickle=False)
        print(f"Latent samples saved to {save_path}")


if __name__ == "__main__":
    main()
