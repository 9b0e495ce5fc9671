"""Input pipeline: batching, transforms, train/val split, device feed.

Behavioural parity with utils/data.py's DataLoader construction
(shuffle/drop_last train loader, optional random val split, eval loader
without the [-1,1] rescale) with the TPU-relevant difference that
batches are handed off as numpy and device_put with a batch sharding by
the trainer — no worker processes (decoding happened once at load).
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from dddpm_tpu.data.datasets import load_dataset


class Loader:
    """Mini-batch iterator over an in-memory uint8 NHWC array.

    train transform = ToTensor + rescale (t*2-1) + optional random
    horizontal flip; eval transform keeps [0, 1]
    (reference utils/data.py:77-96).
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        rescale: bool = True,
        rnd_flip: bool = False,
        seed: int = 0,
    ):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rescale = rescale
        self.rnd_flip = rnd_flip
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.images) // self.batch_size
        if not self.drop_last and len(self.images) % self.batch_size:
            n += 1
        return n

    @property
    def x_shape(self) -> Tuple[int, ...]:
        return self.images.shape[1:]

    def _scale_bias(self) -> Tuple[float, float]:
        # [0,255] -> [0,1], then optionally [-1,1]
        return (2.0 / 255.0, -1.0) if self.rescale else (1.0 / 255.0, 0.0)

    def _transform(self, batch: np.ndarray) -> np.ndarray:
        from dddpm_tpu import native

        scale, bias = self._scale_bias()
        flip = None
        if self.rnd_flip:
            flip = self._rng.rand(len(batch)) < 0.5
        return native.batch_transform(batch, scale, bias, flip)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from dddpm_tpu import native

        order = np.arange(len(self.images))
        if self.shuffle:
            self._rng.shuffle(order)
        end = (len(order) // self.batch_size) * self.batch_size
        if not self.drop_last and end < len(order):
            end = len(order)
        scale, bias = self._scale_bias()
        for i in range(0, end, self.batch_size):
            idx = order[i:i + self.batch_size]
            flip = None
            if self.rnd_flip:
                flip = self._rng.rand(len(idx)) < 0.5
            # fused gather + uint8->f32 transform (native C++ when built)
            yield native.gather_transform(self.images, idx, scale, bias,
                                          flip), self.labels[idx]

    def cycle(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite epoch-reshuffling iterator (reference cycle())."""
        while True:
            yield from iter(self)


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch: overlap host batch prep with device
    compute (the TPU-side analogue of the reference's num_workers=4
    DataLoader processes, utils/data.py:153)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def get_dataloader(
    config: dict,
    train: bool = True,
    data_root: str = "./data/",
    val_split: float = 0.0,
    train_transform: bool = True,
    seed: int = 0,
):
    """Returns (train_loader, val_loader) when train=True, else test loader.

    Mirrors reference get_dataloader (utils/data.py:103-201).
    """
    images, labels = load_dataset(config, train, data_root)
    rescale = train_transform and config.get("model") in ("ddpm", "dddpm")
    rnd_flip = train_transform and bool(config.get("rnd_flip"))
    bs = config["batch_size"]

    if not train:
        return Loader(images, labels, bs, shuffle=False, drop_last=True,
                      rescale=rescale, rnd_flip=False, seed=seed)

    if val_split > 0:
        n = len(images)
        n_val = int(np.ceil(n * val_split))
        perm = np.random.RandomState(seed).permutation(n)
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        train_loader = Loader(images[train_idx], labels[train_idx], bs,
                              shuffle=True, drop_last=True, rescale=rescale,
                              rnd_flip=rnd_flip, seed=seed)
        val_loader = Loader(images[val_idx], labels[val_idx], bs,
                            shuffle=False, drop_last=True, rescale=rescale,
                            rnd_flip=False, seed=seed)
        return train_loader, val_loader
    return Loader(images, labels, bs, shuffle=True, drop_last=True,
                  rescale=rescale, rnd_flip=rnd_flip, seed=seed), None
