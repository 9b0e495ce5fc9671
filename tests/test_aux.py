"""Tests for auxiliary modules: variational helpers, train helpers,
timing, image grids, logging, paths, label maps."""
import json
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.models.variational import (
    GaussianMerge,
    GaussianSample,
    log_gaussian,
    log_standard_gaussian,
    reparametrize,
)
from dddpm_tpu.train.helpers import (
    DeterministicWarmup,
    bce_loss,
    lambda_lr,
    num_to_groups,
)
from dddpm_tpu.utils.images import make_grid, save_image_grid
from dddpm_tpu.utils.logging import RunLogger
from dddpm_tpu.utils.timing import StepTimer, wall_clock


def test_log_standard_gaussian_at_zero():
    x = jnp.zeros((2, 3))
    got = np.asarray(log_standard_gaussian(x))
    want = -0.5 * math.log(2 * math.pi) * 3
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_log_gaussian_reduces_to_standard():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
    got = log_gaussian(x, jnp.zeros_like(x), jnp.zeros_like(x))
    want = log_standard_gaussian(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_reparametrize_stats():
    rng = jax.random.PRNGKey(1)
    mu = jnp.full((20000,), 2.0)
    log_var = jnp.full((20000,), math.log(0.25))
    z = np.asarray(reparametrize(rng, mu, log_var))
    assert abs(z.mean() - 2.0) < 0.02
    assert abs(z.std() - 0.5) < 0.02


def test_gaussian_sample_and_merge_shapes():
    gs = GaussianSample(out_features=4)
    x = jnp.ones((2, 8))
    rng = jax.random.PRNGKey(0)
    params = gs.init(rng, x, rng)
    z, mu, lv = gs.apply(params, x, rng)
    assert z.shape == mu.shape == lv.shape == (2, 4)

    gm = GaussianMerge(out_features=4)
    params = gm.init(rng, x, mu, lv, rng)
    z2, mu2, lv2 = gm.apply(params, x, mu, lv, rng)
    assert z2.shape == (2, 4)
    assert np.isfinite(np.asarray(z2)).all()


def test_num_to_groups():
    assert num_to_groups(50000, 192) == [192] * 260 + [80]
    assert num_to_groups(10, 5) == [5, 5]


def test_lambda_lr():
    f = lambda_lr(100, 0, 50)
    assert f(0) == 1.0
    assert f(75) == 0.5
    np.testing.assert_allclose(f(100), 0.0)
    with pytest.raises(ValueError):
        lambda_lr(10, 0, 10)


def test_deterministic_warmup():
    w = iter(DeterministicWarmup(n=4, t_max=1.0))
    vals = [next(w) for _ in range(6)]
    np.testing.assert_allclose(vals, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])


def test_bce_loss_perfect_prediction_near_zero():
    x = jnp.array([[0.0, 1.0, 1.0, 0.0]])
    r = jnp.array([[0.001, 0.999, 0.999, 0.001]])
    assert float(bce_loss(r, x)[0]) < 0.01


def test_step_timer():
    t = StepTimer(items_per_step=32, warmup=0)
    import time
    t.mark()
    time.sleep(0.01)
    t.mark()
    stats = t.stats()
    assert stats["step_time_mean_s"] >= 0.01
    assert stats["items_per_sec"] > 0


def test_wall_clock():
    with wall_clock() as w:
        pass
    assert w["seconds"] >= 0


def test_make_grid_and_save(tmp_path):
    batch = np.random.rand(4, 8, 8, 3).astype(np.float32)
    grid = make_grid(batch, nrow=2, pad=1)
    assert grid.shape == (2 * 9 + 1, 2 * 9 + 1, 3)
    path = str(tmp_path / "grid.png")
    save_image_grid(batch, path, nrow=2)
    assert os.path.exists(path)
    # grayscale path
    save_image_grid(batch[..., :1], str(tmp_path / "g2.png"), nrow=2)


def test_run_logger(tmp_path):
    logger = RunLogger("proj", {"model": "ddpm"}, log_dir=str(tmp_path),
                       mute=True)
    logger.log({"train_obj": jnp.asarray(1.5)}, step=3)
    logger.flush()
    with open(logger.metrics_path) as f:
        row = json.loads(f.readline())
    assert row == {"step": 3, "train_obj": 1.5}
    logger.log_images({"sample": np.random.rand(4, 8, 8, 3)}, step=3, nrow=2)
    logger.finish()


def test_label_maps_and_paths():
    from dddpm_tpu.data.datasets import get_label_map
    from dddpm_tpu.utils import paths

    assert len(get_label_map("cifar10")) == 10
    with pytest.raises(ValueError):
        get_label_map("omniglot")
    assert paths.LOGGING_DIR
