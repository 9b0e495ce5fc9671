"""Training entry point.

CLI-compatible with the reference train.py:
    python train.py -m ddpm -d cifar10 -e 800000 -bs 32 -is 32 -downsample 0 [-mute]
plus TPU extensions (--data-root, --compute-dtype, --seed).
"""
import json

from dddpm_tpu.config import get_args
from dddpm_tpu.train.trainer import setup_trainer

WANDB_PROJECT = "ddpm-test"


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    # multi-host slices: join the global mesh before touching devices
    # (no-op for single-process runs; see parallel/mesh.py)
    from dddpm_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    config, mute = get_args()
    trainer, config = setup_trainer(
        config, mute, config.get("data_root", "../data/"), WANDB_PROJECT,
        config.get("seed", 0),
    )

    print("\nTraining configuration dict:")
    print(json.dumps({k: str(v) if isinstance(v, tuple) else v
                      for k, v in config.items()}, indent=4) + "\n")

    trainer.train()
    print("train.py script finished!")


if __name__ == "__main__":
    main()
