"""Dump a reference batch of real images for FID evaluation.

Reference create_ref_batch.py: training images with eval transforms (no
[-1,1] rescale), as (n_batches, B, H, W, C) x255 NHWC npy.

    python create_ref_batch.py -d cifar10 -is 32 [--n 50000] [--bs 100]
"""
import argparse
import os

import numpy as np

from dddpm_tpu.data.pipeline import get_dataloader


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", default="cifar10", dest="dataset")
    p.add_argument("-is", type=int, default=32, dest="image_size")
    p.add_argument("--n", type=int, default=50000)
    p.add_argument("--bs", type=int, default=100)
    p.add_argument("--data-root", default="../data/", dest="data_root")
    p.add_argument("--out", default="results/reference")
    args = p.parse_args()

    config = {"dataset": args.dataset, "image_size": args.image_size,
              "batch_size": args.bs, "rnd_flip": False}
    loader, _ = get_dataloader(config, True, args.data_root,
                               train_transform=False)

    batches = []
    total = 0
    for x, _ in loader:
        batches.append(x * 255.0)  # eval transform keeps [0,1]
        total += len(x)
        if total >= args.n:
            break

    out = np.stack(batches)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{args.dataset}_{total}")
    np.save(path, out, allow_pickle=False)
    print(f"Saved reference batch {out.shape} to {path}.npy")


if __name__ == "__main__":
    main()
