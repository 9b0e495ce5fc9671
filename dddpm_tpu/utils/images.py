"""Image grid utilities (torchvision save_image equivalent, numpy+PIL).

Used for the every-10k-steps sample/reconstruction grids the reference
logs (trainers/train_helpers.py:61-87).
"""
from __future__ import annotations

import numpy as np


def make_grid(batch: np.ndarray, nrow: int = 5, pad: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile a (N, H, W, C) batch in [0, 1] into one (H', W', C) image."""
    n, h, w, c = batch.shape
    ncol = nrow
    nrows = int(np.ceil(n / ncol))
    grid = np.full(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
        pad_value, dtype=np.float32,
    )
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y = r * (h + pad) + pad
        x = cidx * (w + pad) + pad
        grid[y:y + h, x:x + w] = batch[i]
    return grid


def save_image_grid(batch: np.ndarray, path: str, nrow: int = 5):
    """Save a [0,1] NHWC batch as a tiled PNG."""
    from PIL import Image

    grid = make_grid(np.clip(batch, 0.0, 1.0), nrow=nrow)
    arr = (grid * 255.0).round().astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path
