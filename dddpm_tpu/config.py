"""Training configuration and CLI argument surface.

Keeps the reference's config-dict contract and CLI flags
(-m/-d/-e/-bs/-is/-mute/-downsample; /root/reference/utils/cli_args.py:4-83,
/root/reference/train.py:14-75) so recipes and checkpoints are drop-in
comparable, while adding TPU-specific knobs (compute dtype, mesh shape,
data-parallel batch sharding).
"""
from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

MODEL_NAMES = ["ddpm"]

DATASETS = [
    "cifar10",
    "cifar100",
    "mnist",
    "omniglot",
    "celeba",
    "celeba_hq_64",
    "celeba_hq",
    "synthetic",
]

# base config for every model
CONFIG: Dict = {
    "lr": 1e-3,
    "rnd_flip": False,
}

# per-model architecture configs (reference train.py:20-63)
CONFIG_MODEL: Dict[str, Dict] = {
    "ddpm": {
        "lr": 2e-4,                 # iddpm: 2e-4 for 32x32, 2e-5 for 256x256
        "unet_chan": 128,
        "unet_dims": (1, 2, 2, 2),
        "unet_dropout": 0.1,
        "T": 1000,
        "loss_type": "simple",      # simple | vlb | hybrid
        "beta_schedule": "linear",  # linear | cosine
        "ema_decay": 0.995,
        "loss_flat": "sum",         # sum | mean over non-batch loss dims
        "val_split": 0,
    },
    "dddpm": {
        "d_mode": "convolutional_res",  # deterministic | convolutional | convolutional_res
        "u_mode": "convolutional_res",
        "d_dropout": 0,
        "d_chans": 64,
        "d_n_blocks": 3,
        "u_n_blocks": 3,
        "unet_in": 8,
        "ae_loss": True,
        "t_rec_max": 100,
        "force_latent": True,
    },
}

# TPU-specific defaults merged into every run config
CONFIG_TPU: Dict = {
    "compute_dtype": "bfloat16",  # UNet matmul/conv compute dtype
    "grad_accum": 2,              # micro-steps per optimizer step
    "mesh_shape": None,           # None -> all local devices on one 'data' axis
    "seed": 0,
    "use_pallas_attention": "auto",  # auto | True | False (pinned by build_model)
    # Fused resampler ConvResBlock Pallas kernel (ops/pallas/convres.py).
    # Default ON since r4: with the residual add and the 2x pool /
    # upsample folded INTO the kernel (whole-block boundary), the x3
    # 256^2 train step measures 254.7 ms vs 292.1 ms XLA (-12.8%,
    # 219 -> 251 imgs/sec/chip, v5e bs32).  The r3 core-only kernel
    # lost ~10% at the model level precisely because XLA's cross-block
    # fusion (residual + pool + adjacent 1x1s) was left on the table.
    "use_pallas_resample": True,
    "remat": False,               # rematerialize UNet ResnetBlocks under grad
    "fsdp": False,                # shard params/EMA/opt-state over the data axis
    "prefetch": 2,                # host batch-prep prefetch depth (0 = off)
    # Gather-compacted recon branch for the AE dDDPM variant: the
    # t < t_rec_max gate zeroes ~90% of the batch's recon loss AND its
    # resampler gradients (the only grads the resamplers get, since z is
    # detached before the DDPM loss), so the resampler fwd+bwd runs on a
    # static-capacity sub-batch of the masked samples with an exact
    # lax.cond dense fallback on overflow (models/dddpm.py:recon_capacity).
    "recon_compact": True,
}


def parse_mesh_shape(text):
    """'4,2' -> (4, 2); '' / 'none' / None -> None."""
    if text is None or str(text).lower() in ("", "none"):
        return None
    return tuple(int(x) for x in str(text).split(","))


def modify_config(config: Dict, model_config: Dict) -> Dict:
    """Merge model_config into config (reference utils/utils.py:5-8)."""
    for key, value in model_config.items():
        config[key] = value
    return config


def build_config(args_dict: Dict) -> Dict:
    """Produce the final run config from parsed CLI args.

    Applies the 'ddpm' + n_downsamples>0 -> 'dddpm' rewrite
    (reference train.py:71-75).
    """
    config = dict(CONFIG)
    config.update(CONFIG_TPU)
    for key, value in args_dict.items():
        if key not in ("mute",):
            config[key] = value
    config = modify_config(config, dict(CONFIG_MODEL[config["model"]]))
    if config["model"] == "ddpm" and config.get("n_downsamples", 0) > 0:
        config["model"] = "dddpm"
        config = modify_config(config, dict(CONFIG_MODEL["dddpm"]))
    if config.pop("T_override", None):
        config["T"] = args_dict["T_override"]
    return config


def get_args(
    data_names: List[str] = DATASETS,
    model_names: List[str] = MODEL_NAMES,
    argv=None,
) -> Tuple[Dict, bool]:
    """Parse CLI args, mirroring the reference flag surface."""
    parser = argparse.ArgumentParser(description="Model training script.")
    parser.add_argument(
        "-m", default=model_names[0], type=str, choices=model_names, dest="model",
        help=f"Pick which model to train (default: {model_names[0]}).",
    )
    parser.add_argument(
        "-d", default=data_names[0], type=str, choices=data_names, dest="dataset",
        help=f"Pick which dataset to fit to (default: {data_names[0]}).",
    )
    parser.add_argument(
        "-e", default=500, type=int, dest="n_steps",
        help="Number of train steps to perform (default: 500).",
    )
    parser.add_argument("-bs", default=32, type=int, dest="batch_size",
                        help="Batch size of data.")
    parser.add_argument("-is", default=32, type=int, dest="image_size",
                        help="Image size of data.")
    parser.add_argument("-mute", action="store_true",
                        help="Mute progress and logging output.")
    parser.add_argument(
        "-downsample", default=0, type=int, dest="n_downsamples",
        help="How many x2 downsamples to perform. 0 runs standard DDPM.",
    )
    # TPU-native extensions
    parser.add_argument("--data-root", default="../data/", type=str, dest="data_root")
    parser.add_argument("--T", default=None, type=int, dest="T_override",
                        help="override the number of diffusion steps T")
    parser.add_argument("--compute-dtype", default="bfloat16", type=str,
                        choices=["bfloat16", "float32"], dest="compute_dtype")
    parser.add_argument("--seed", default=0, type=int, dest="seed")
    parser.add_argument("--grad-accum", default=2, type=int, dest="grad_accum",
                        help="micro-steps per optimizer step")
    parser.add_argument("--mesh-shape", default=None, type=parse_mesh_shape,
                        dest="mesh_shape",
                        help="device mesh shape, e.g. '8' or '4,2' "
                             "(default: all local devices on one data axis)")
    parser.add_argument("--use-pallas", default="auto", type=str,
                        choices=["auto", "on", "off"], dest="use_pallas",
                        help="fused Pallas attention kernel (auto: on for "
                             "real hardware, off on CPU)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize UNet ResnetBlocks under grad "
                             "(activation memory for recompute, 256^2 configs)")
    parser.add_argument("--fsdp", action="store_true",
                        help="FSDP-style parameter sharding over the data axis")
    parser.add_argument("--prefetch", default=2, type=int,
                        help="background host batch-prep depth (0 disables)")
    args = parser.parse_args(argv)
    args.use_pallas_attention = {
        "auto": "auto", "on": True, "off": False}[args.use_pallas]
    del args.use_pallas

    config = build_config(vars(args))
    return config, args.mute
