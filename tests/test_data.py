"""Data pipeline tests: synthetic dataset, transforms, loader semantics,
val split, MNIST/CIFAR readers on generated fixture files."""
import gzip
import os
import pickle

import numpy as np
import pytest

from dddpm_tpu.data.datasets import (
    get_color_channels,
    load_cifar,
    load_mnist,
    make_synthetic,
)
from dddpm_tpu.data.pipeline import Loader, get_dataloader


def test_synthetic_deterministic():
    a, la = make_synthetic(16, 3, n=8, seed=0)
    b, lb = make_synthetic(16, 3, n=8, seed=0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 16, 16, 3) and a.dtype == np.uint8


def test_loader_rescales_to_minus1_1():
    imgs, labels = make_synthetic(8, 3, n=32)
    loader = Loader(imgs, labels, batch_size=8, rescale=True, shuffle=False)
    x, y = next(iter(loader))
    assert x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0
    np.testing.assert_allclose(
        x, (imgs[:8].astype(np.float64) / 255.0 * 2 - 1).astype(np.float32),
        atol=1e-7)


def test_loader_eval_keeps_0_1():
    imgs, labels = make_synthetic(8, 3, n=16)
    loader = Loader(imgs, labels, batch_size=8, rescale=False, shuffle=False)
    x, _ = next(iter(loader))
    assert x.min() >= 0.0 and x.max() <= 1.0


def test_loader_drop_last_and_len():
    imgs, labels = make_synthetic(8, 3, n=20)
    loader = Loader(imgs, labels, batch_size=8, drop_last=True)
    assert len(loader) == 2
    assert sum(1 for _ in loader) == 2
    loader2 = Loader(imgs, labels, batch_size=8, drop_last=False)
    assert len(loader2) == 3
    batches = list(loader2)
    assert batches[-1][0].shape[0] == 4


def test_loader_shuffles_between_epochs():
    imgs, labels = make_synthetic(8, 1, n=64)
    labels = np.arange(64)
    loader = Loader(imgs, labels, batch_size=64, shuffle=True, seed=3)
    _, y1 = next(iter(loader))
    _, y2 = next(iter(loader))
    assert not np.array_equal(y1, y2)


def test_loader_cycle_infinite():
    imgs, labels = make_synthetic(8, 3, n=16)
    loader = Loader(imgs, labels, batch_size=8)
    it = loader.cycle()
    for _ in range(5):  # > one epoch (2 batches)
        x, _ = next(it)
        assert x.shape == (8, 8, 8, 3)


def test_loader_flip_augmentation():
    imgs, labels = make_synthetic(8, 3, n=64, seed=1)
    loader = Loader(imgs, labels, batch_size=64, rescale=True, rnd_flip=True,
                    shuffle=False, seed=0)
    x, _ = next(iter(loader))
    base = imgs.astype(np.float32) / 255 * 2 - 1
    flipped = (np.abs(x - base).max(axis=(1, 2, 3)) > 1e-6)
    # about half the images should be flipped
    assert 10 < flipped.sum() < 54


def test_get_dataloader_val_split():
    cfg = {"dataset": "synthetic", "image_size": 8, "batch_size": 8,
           "model": "ddpm", "rnd_flip": False}
    train, val = get_dataloader(cfg, True, val_split=0.25)
    assert val is not None
    n_train = len(train.images)
    n_val = len(val.images)
    assert n_train + n_val == 512
    assert abs(n_val - 128) <= 1


def test_mnist_reader(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    imgs = np.random.RandomState(0).randint(0, 255, (10, 28, 28), np.uint8)
    labels = np.arange(10, dtype=np.uint8)

    def idx_bytes(arr, magic):
        out = magic.to_bytes(4, "big")
        for d in arr.shape:
            out += d.to_bytes(4, "big")
        return out + arr.tobytes()

    # write images gzipped (as torchvision leaves them) and labels raw
    with gzip.open(raw / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(idx_bytes(imgs, 0x00000803))
    with open(raw / "train-labels-idx1-ubyte", "wb") as f:
        f.write(idx_bytes(labels, 0x00000801))

    x, y = load_mnist(str(tmp_path), train=True)
    assert x.shape == (10, 28, 28, 1)
    np.testing.assert_array_equal(x[..., 0], imgs)
    np.testing.assert_array_equal(y, labels)


def test_cifar_reader(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 255, (4, 3072), np.uint8)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(range(4))}, f)
    x, y = load_cifar(str(tmp_path), train=True)
    assert x.shape == (20, 32, 32, 3)
    assert y.shape == (20,)


def test_color_channels():
    assert get_color_channels("mnist") == 1
    assert get_color_channels("cifar10") == 3
    with pytest.raises(ValueError):
        get_color_channels("imagenet")


def test_resize_center_crop_via_loader():
    """image_size different from native size triggers resize+crop."""
    cfg = {"dataset": "synthetic", "image_size": 12, "batch_size": 4,
           "model": "ddpm", "rnd_flip": False}
    train, _ = get_dataloader(cfg, True)
    x, _ = next(iter(train))
    assert x.shape == (4, 12, 12, 3)


def test_omniglot_folder_end_to_end(tmp_path):
    """Omniglot loads 1-channel (reference torchvision Omniglot is
    grayscale; utils/data.py:204-210) and flows through build_model +
    a loss step without channel mismatch."""
    from PIL import Image
    import jax
    import jax.numpy as jnp
    from dddpm_tpu.models.factory import build_model

    rng = np.random.RandomState(0)
    for char in ("character01", "character02"):
        d = tmp_path / "omniglot-py" / "images_background" / "Alpha" / char
        os.makedirs(d)
        for i in range(4):
            Image.fromarray(
                (rng.rand(20, 20) * 255).astype(np.uint8), "L"
            ).save(d / f"{i}.png")

    cfg = {"dataset": "omniglot", "image_size": 16, "batch_size": 4,
           "model": "ddpm", "rnd_flip": False, "T": 5,
           "loss_type": "simple", "beta_schedule": "cosine",
           "loss_flat": "sum", "unet_chan": 8, "unet_dims": (1, 2),
           "unet_dropout": 0.0, "compute_dtype": "float32"}
    train, _ = get_dataloader(cfg, True, data_root=str(tmp_path))
    x, _ = next(iter(train))
    assert x.shape == (4, 16, 16, 1)
    assert get_color_channels("omniglot") == 1

    net, proc, init_fn, cfg = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    obj, parts = proc.loss_fn(params, jax.random.PRNGKey(1), jnp.asarray(x),
                              train=False)
    assert np.isfinite(float(obj))


def test_prefetch_preserves_order_and_terminates():
    from dddpm_tpu.data.pipeline import prefetch

    items = list(prefetch(iter(range(10)), size=3))
    assert items == list(range(10))
    # and over a finite loader epoch
    imgs, labels = make_synthetic(8, 3, n=16)
    loader = Loader(imgs, labels, batch_size=8, shuffle=False)
    batches = list(prefetch(iter(loader)))
    assert len(batches) == 2
