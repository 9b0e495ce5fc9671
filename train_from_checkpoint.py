"""Resume training from a saved checkpoint directory.

Reference train_from_checkpoint.py:11-24 rebuilds the trainer from the
config stored inside the checkpoint and resumes at the saved step.

    python train_from_checkpoint.py --checkpoint results/checkpoints/<run> \
        [--steps N] [--data-root PATH] [-mute]
"""
import argparse

from dddpm_tpu.train import checkpoint as ckpt
from dddpm_tpu.train.trainer import setup_trainer

WANDB_PROJECT = "ddpm-test"


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="checkpoint directory")
    p.add_argument("--steps", type=int, default=None,
                   help="override total train steps")
    p.add_argument("--data-root", default="../data/", dest="data_root")
    p.add_argument("-mute", action="store_true")
    args = p.parse_args()

    config = ckpt.load_config(args.checkpoint)
    if args.steps is not None:
        config["n_steps"] = args.steps
    if "unet_dims" in config:
        config["unet_dims"] = tuple(config["unet_dims"])

    trainer, config = setup_trainer(config, args.mute, args.data_root,
                                    WANDB_PROJECT, config.get("seed", 0))
    trainer.load_checkpoint(args.checkpoint)
    print(f"Resuming {config['model']} at step {trainer.step}")
    trainer.train()


if __name__ == "__main__":
    main()
