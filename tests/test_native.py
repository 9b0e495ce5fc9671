"""Native C++ batch-op tests: build, correctness vs numpy, fallback."""
import numpy as np
import pytest

from dddpm_tpu import native


def _numpy_ref(images, scale, bias, flip=None):
    # double-precision affine then f32 cast — matches the native LUT's
    # exact-endpoint behaviour (255*(2/255)-1 == 1.0f)
    out = (images.astype(np.float64) * scale + bias).astype(np.float32)
    if flip is not None:
        m = flip.astype(bool)
        out[m] = out[m, :, ::-1]
    return out


def test_native_library_builds():
    lib = native.get_lib()
    # g++ is in the image; the library must build
    assert lib is not None


def test_batch_transform_matches_numpy():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (6, 9, 7, 3), np.uint8)
    got = native.batch_transform(imgs, 2.0 / 255.0, -1.0)
    want = _numpy_ref(imgs, 2.0 / 255.0, -1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_batch_transform_flip():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (4, 5, 6, 1), np.uint8)
    flip = np.array([True, False, True, False])
    got = native.batch_transform(imgs, 1.0 / 255.0, 0.0, flip)
    want = _numpy_ref(imgs, 1.0 / 255.0, 0.0, flip)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_transform_matches_indexed_numpy():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (10, 4, 4, 3), np.uint8)
    idx = np.array([7, 0, 3, 3])
    flip = np.array([False, True, False, True])
    got = native.gather_transform(imgs, idx, 2.0 / 255.0, -1.0, flip)
    want = _numpy_ref(imgs[idx], 2.0 / 255.0, -1.0, flip)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_numpy_fallback_path(monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    imgs = np.random.RandomState(3).randint(0, 256, (3, 4, 4, 3), np.uint8)
    got = native.batch_transform(imgs, 1 / 255.0, 0.0)
    np.testing.assert_allclose(got, _numpy_ref(imgs, 1 / 255.0, 0.0))
    idx = np.array([2, 0])
    got = native.gather_transform(imgs, idx, 1 / 255.0, 0.0)
    np.testing.assert_allclose(got, _numpy_ref(imgs[idx], 1 / 255.0, 0.0))
