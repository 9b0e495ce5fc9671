"""Hardware smoke test: short real training run on the current backend
(bf16 + fused attention when on TPU), verifying the loss goes down and
sampling produces finite images.

    python scripts/smoke_tpu.py [--steps 150]
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    args = p.parse_args()

    from dddpm_tpu.train.trainer import setup_trainer

    config = {
        "model": "ddpm", "dataset": "synthetic", "image_size": 32,
        "batch_size": 32, "n_steps": args.steps, "lr": 2e-4, "T": 100,
        "loss_type": "simple", "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 32, "unet_dims": (1, 2, 2), "unet_dropout": 0.1,
        "ema_decay": 0.995, "val_split": 0, "rnd_flip": False,
        "grad_accum": 2, "compute_dtype": "bfloat16",
    }
    trainer, config = setup_trainer(config, mute=True,
                                    workdir="/tmp/smoke_tpu", n_samples=4)
    trainer.init_logging()
    trainer.train_loop()
    trainer._flush_metrics(trainer.step)

    losses = trainer.train_losses
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    stats = trainer.timer.stats()
    print(f"steps: {len(losses)}  loss {first:.1f} -> {last:.1f} "
          f"({100 * (1 - last / first):.0f}% drop)  "
          f"{stats.get('items_per_sec', 0):.0f} imgs/sec")
    assert last < first * 0.7, "loss did not decrease enough"

    samples = np.asarray(trainer.sample())
    assert np.isfinite(samples).all(), "non-finite samples"
    print(f"samples: shape {samples.shape}, range "
          f"[{samples.min():.2f}, {samples.max():.2f}] — OK")


if __name__ == "__main__":
    main()
