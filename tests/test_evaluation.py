"""Evaluator tests: Frechet distance math, IS, precision/recall
manifolds, InceptionV3 head shapes, end-to-end Evaluator."""
import numpy as np
import pytest
from scipy.spatial.distance import cdist

from dddpm_tpu.evaluation.fid import (
    FIDStatistics,
    compute_fid,
    compute_inception_score,
)
from dddpm_tpu.evaluation.prec_recall import (
    ManifoldEstimator,
    _pairwise_sq_dists,
    compute_prec_recall,
)


def test_fid_zero_for_identical_sets():
    acts = np.random.RandomState(0).randn(500, 16)
    assert abs(compute_fid(acts, acts.copy())) < 1e-6


def test_fid_mean_shift_closed_form():
    """For equal covariances, FID = |mu1 - mu2|^2."""
    rng = np.random.RandomState(1)
    a = rng.randn(20000, 8)
    shift = np.full(8, 0.5)
    b = a + shift
    fid = compute_fid(a, b)
    np.testing.assert_allclose(fid, np.dot(shift, shift), atol=0.02)


def test_fid_scale_closed_form():
    """Isotropic scale: FID = d*(s-1)^2 for unit-cov base (approx)."""
    rng = np.random.RandomState(2)
    a = rng.randn(50000, 4)
    b = 2.0 * rng.randn(50000, 4)
    # trace term: d*(1 + s^2 - 2s) = 4 * 1 = 4
    np.testing.assert_allclose(compute_fid(a, b), 4.0, atol=0.1)


def test_inception_score_bounds():
    # uniform predictions -> IS = 1
    uniform = np.full((100, 10), 0.1)
    np.testing.assert_allclose(compute_inception_score(uniform), 1.0, rtol=1e-6)
    # confident + diverse predictions -> IS = n_classes
    onehot = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
    onehot /= onehot.sum(1, keepdims=True)
    assert compute_inception_score(onehot) > 8.0


def test_pairwise_dists_match_scipy():
    rng = np.random.RandomState(3)
    a, b = rng.randn(50, 7).astype(np.float32), rng.randn(30, 7).astype(np.float32)
    got = np.asarray(_pairwise_sq_dists(a, b))
    want = cdist(a, b, "sqeuclidean")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_manifold_identical_sets_full_membership():
    feats = np.random.RandomState(4).randn(200, 8).astype(np.float32)
    m = ManifoldEstimator(feats, nhood_size=3)
    assert m.evaluate(feats).mean() == 1.0


def test_prec_recall_disjoint_clusters():
    rng = np.random.RandomState(5)
    real = rng.randn(200, 8).astype(np.float32)
    fake = real + 1000.0  # far away
    prec, recall = compute_prec_recall(real, fake)
    assert prec == 0.0 and recall == 0.0
    prec, recall = compute_prec_recall(real, real.copy())
    assert prec == 1.0 and recall == 1.0


def test_prec_recall_partial_overlap():
    rng = np.random.RandomState(6)
    real = rng.randn(300, 4).astype(np.float32)
    # fake: half inside the real cloud, half far away
    fake = np.concatenate([rng.randn(150, 4), rng.randn(150, 4) + 500.0]
                          ).astype(np.float32)
    prec, _ = compute_prec_recall(real, fake)
    assert 0.3 < prec < 0.7


@pytest.fixture(scope="module")
def extractor():
    from dddpm_tpu.evaluation.inception import FeatureExtractor

    return FeatureExtractor(batch_size=4)


def test_inception_head_shapes(extractor):
    imgs = np.random.RandomState(7).randint(0, 255, (4, 16, 16, 3), np.uint8)
    out = extractor(imgs)
    assert out["pool3"].shape == (4, 2048)
    assert out["softmax"].shape == (4, 1008)
    np.testing.assert_allclose(out["softmax"].sum(1), 1.0, rtol=1e-4)
    assert out["spatial"].shape == (4, 7 * 17 * 17)
    for v in out.values():
        assert np.isfinite(v).all()


def test_inception_grayscale_and_padding(extractor):
    # 6 single-channel images with batch_size=4 exercises the pad path
    imgs = np.random.RandomState(8).randint(0, 255, (6, 12, 12, 1), np.uint8)
    out = extractor(imgs)
    assert out["pool3"].shape == (6, 2048)


def test_evaluator_end_to_end(extractor):
    from dddpm_tpu.evaluation.evaluator import Evaluator, flatten_batches

    ev = Evaluator.__new__(Evaluator)  # reuse module-scoped extractor
    ev.extractor = extractor

    rng = np.random.RandomState(9)
    ref = rng.randint(0, 255, (2, 4, 16, 16, 3)).astype(np.float32)
    samples = rng.randint(0, 255, (8, 16, 16, 3)).astype(np.float32)
    assert flatten_batches(ref).shape == (8, 16, 16, 3)
    metrics = ev.evaluate(ref, samples, prec_recall_subset=8)
    for k in ("is", "fid", "sfid", "precision", "recall"):
        assert k in metrics
        assert np.isfinite(metrics[k]) or k in ("fid", "sfid")
    assert metrics["inception_weights"] == "random-init"


def test_compute_test_losses_helper():
    import jax
    import jax.numpy as jnp
    from dddpm_tpu.evaluation.helpers import compute_test_losses, generator_batches
    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.data.pipeline import get_dataloader

    cfg = {"model": "ddpm", "dataset": "synthetic", "image_size": 8,
           "batch_size": 8, "T": 5, "loss_type": "simple",
           "beta_schedule": "cosine", "loss_flat": "sum",
           "unet_chan": 8, "unet_dims": (1, 2), "unet_dropout": 0.0,
           "compute_dtype": "float32", "rnd_flip": False}
    net, proc, init_fn, cfg = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    test_loader = get_dataloader(cfg, False)
    vlb, l_simple = compute_test_losses(proc, params, jax.random.PRNGKey(1),
                                        test_loader, max_batches=2)
    assert np.isfinite(vlb) and vlb > 0       # bits/dim
    assert np.isfinite(l_simple) and l_simple > 0

    # generator_batches expects an eval-transform ([0,1]) loader
    eval_loader = get_dataloader(cfg, False, train_transform=False)
    batch = next(generator_batches(eval_loader))
    assert batch.min() >= 0 and batch.max() <= 255 and batch.max() > 1


def test_inception_npz_weight_loading(tmp_path, extractor):
    import jax
    from dddpm_tpu.evaluation.inception import load_params_npz

    # export a couple of real template leaves to an npz and reload them
    flat = jax.tree_util.tree_flatten_with_path(extractor.params)[0]
    entries = {}
    for path_keys, leaf in flat[:3]:
        key = "/".join(getattr(p, "key", str(p)) for p in path_keys)
        entries[key] = np.full(leaf.shape, 0.123, np.float32)
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **entries)

    loaded = load_params_npz(npz, extractor.params)
    flat_l = jax.tree_util.tree_flatten_with_path(loaded)[0]
    replaced = 0
    for (path_keys, leaf) in flat_l:
        key = "/".join(getattr(p, "key", str(p)) for p in path_keys)
        if key in entries:
            np.testing.assert_allclose(np.asarray(leaf), 0.123, rtol=1e-6)
            replaced += 1
    assert replaced == 3
