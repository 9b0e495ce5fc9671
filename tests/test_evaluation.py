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


@pytest.mark.slow
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


def test_image_batch_stream_all_sources(tmp_path):
    """Array / 5-D array / npy / npz / compressed npz all yield the
    same batches, with the npz path streamed in bounded chunks."""
    from dddpm_tpu.evaluation.io import image_batch_stream

    rng = np.random.RandomState(11)
    arr5 = rng.randint(0, 255, (3, 4, 8, 8, 3)).astype(np.uint8)
    flat = arr5.reshape(-1, 8, 8, 3)
    npy = str(tmp_path / "a.npy")
    npz = str(tmp_path / "a.npz")
    npzc = str(tmp_path / "c.npz")
    np.save(npy, arr5)
    np.savez(npz, arr5)
    np.savez_compressed(npzc, flat)

    for src in (arr5, flat, npy, npz, npzc):
        batches = list(image_batch_stream(src, 5))
        assert [len(b) for b in batches] == [5, 5, 2]
        np.testing.assert_array_equal(np.concatenate(batches), flat)


def test_evaluator_accepts_paths(tmp_path, extractor):
    """read_activations on an npz path == on the in-memory array."""
    rng = np.random.RandomState(12)
    imgs = rng.randint(0, 255, (6, 16, 16, 3)).astype(np.uint8)
    npz = str(tmp_path / "samples.npz")
    np.savez(npz, imgs)

    from_arr = extractor(imgs)
    from_path = extractor(npz)
    for k in from_arr:
        np.testing.assert_allclose(from_path[k], from_arr[k], atol=1e-5)


def test_inception_activation_golden(extractor):
    """Deterministic weights + deterministic input -> precomputed
    pool3/spatial/softmax values (generated once by
    scripts/gen_inception_golden.py).  Guards the flax graph topology:
    any change to conv wiring, pooling, head slicing, or preprocessing
    moves these numbers."""
    import sys
    sys.path.insert(0, "scripts")
    from gen_inception_golden import deterministic_params, golden_input
    from dddpm_tpu.evaluation.inception import FeatureExtractor

    fe = FeatureExtractor.__new__(FeatureExtractor)
    fe.model = extractor.model
    fe.batch_size = 4
    fe.has_real_weights = False
    fe.params = deterministic_params(extractor.params)
    fe._features = extractor._features

    out = fe(golden_input())
    assert out["pool3"].shape == (4, 2048)
    assert out["spatial"].shape == (4, 2023)  # 7 * 17 * 17
    assert out["softmax"].shape == (4, 1008)
    np.testing.assert_allclose(out["pool3"].mean(), 2.59155780e-02, rtol=1e-4)
    np.testing.assert_allclose(
        out["pool3"][0, :5],
        [0.0023822549264878035, 0.0352320596575737, 0.05151167884469032,
         0.043564535677433014, 0.015128325670957565], rtol=1e-3)
    np.testing.assert_allclose(out["spatial"].mean(), 1.84167381e-02, rtol=1e-4)
    np.testing.assert_allclose(
        out["spatial"][0, 3:6],
        [0.005008614156395197, 0.035317566245794296, 0.04901612177491188],
        rtol=1e-3)
    np.testing.assert_allclose(out["softmax"].mean(), 9.92063549e-04, rtol=1e-5)
    np.testing.assert_allclose(
        out["softmax"][0, :5],
        [0.0009896111441776156, 0.0009901128942146897, 0.0009915338596329093,
         0.0009932077955454588, 0.0009943470358848572], rtol=1e-3)


def _template_entries(params):
    """Full {flax path: array} dict for a params pytree."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(getattr(p, "key", str(p)) for p in ks): np.asarray(v)
            for ks, v in flat}


def test_inception_npz_partial_loading(tmp_path, extractor):
    import jax
    from dddpm_tpu.evaluation.inception import load_params_npz

    # a partial npz loads only with allow_partial=True
    entries = dict(list(_template_entries(extractor.params).items())[:3])
    entries = {k: np.full(v.shape, 0.123, np.float32)
               for k, v in entries.items()}
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **entries)

    with pytest.raises(ValueError, match="not in npz"):
        load_params_npz(npz, extractor.params)

    loaded = load_params_npz(npz, extractor.params, allow_partial=True)
    flat_l = _template_entries(loaded)
    for key in entries:
        np.testing.assert_allclose(flat_l[key], 0.123, rtol=1e-6)


def test_inception_npz_strict_loading(tmp_path, extractor):
    from dddpm_tpu.evaluation.inception import load_params_npz

    entries = _template_entries(extractor.params)
    npz = str(tmp_path / "full.npz")
    np.savez(npz, **entries)
    load_params_npz(npz, extractor.params)  # complete npz: strict load OK

    # extra keys fail loudly, even with allow_partial
    bad = dict(entries, **{"params/Nonexistent_0/kernel": np.zeros(3)})
    np.savez(str(tmp_path / "extra.npz"), **bad)
    with pytest.raises(ValueError, match="matched nothing"):
        load_params_npz(str(tmp_path / "extra.npz"), extractor.params)

    # shape mismatch fails loudly, even with allow_partial
    key = next(iter(entries))
    bad = dict(entries)
    bad[key] = np.zeros((2, 2), np.float32)
    np.savez(str(tmp_path / "shape.npz"), **bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params_npz(str(tmp_path / "shape.npz"), extractor.params)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params_npz(str(tmp_path / "shape.npz"), extractor.params,
                        allow_partial=True)


def test_extractor_missing_weights_file_raises():
    from dddpm_tpu.evaluation.inception import FeatureExtractor

    with pytest.raises(FileNotFoundError):
        FeatureExtractor("/nonexistent/weights.npz")


def test_conv_param_paths_cover_template(extractor):
    """Every template param is a ConvBN conv or the logits Dense — the
    call-order walk must enumerate exactly the param tree."""
    from dddpm_tpu.evaluation.inception import (
        conv_param_paths, param_template_shapes)

    paths = conv_param_paths()
    assert paths[-1] == "params/Dense_0"
    assert len(paths) == len(set(paths))
    expected_keys = set()
    for p in paths:
        expected_keys.add(f"{p}/kernel")
        if "Dense" not in p:  # the logits Dense is bias-free
            expected_keys.add(f"{p}/bias")
    assert expected_keys == set(param_template_shapes().keys())
    # template shapes match the real init
    real = {k: v.shape for k, v in _template_entries(extractor.params).items()}
    assert {k: tuple(v) for k, v in real.items()} == param_template_shapes()


@pytest.mark.slow
def test_exporter_roundtrip_synthetic_graph(tmp_path, extractor):
    """Synthesize a TF-graph walk with the right shapes, run the
    exporter's pure mapping, and strict-load the result — proves the
    exporter output matches what the loader expects, without TF."""
    import sys
    sys.path.insert(0, "scripts")
    from export_inception_weights import build_entries, fold_bn
    from dddpm_tpu.evaluation.inception import (
        FeatureExtractor, conv_param_paths, param_template_shapes)

    template = param_template_shapes()
    conv_paths = conv_param_paths(include_dense=False)
    rng = np.random.RandomState(0)
    tf_convs = []
    for i, p in enumerate(conv_paths):
        shape = template[f"{p}/kernel"]
        cout = shape[-1]
        tf_convs.append({
            "name": f"mixed_{i}/conv", "kernel": rng.randn(*shape) * 0.01,
            "beta": rng.randn(cout) * 0.1, "mean": rng.randn(cout) * 0.1,
            "var": 1.0 + 0.1 * rng.rand(cout), "gamma": None,
        })
    lk = rng.randn(*template["params/Dense_0/kernel"]) * 0.01
    entries = build_entries(tf_convs, lk)
    npz = str(tmp_path / "inception.npz")
    np.savez(npz, **entries)

    fe = FeatureExtractor(npz, batch_size=2)
    assert fe.has_real_weights
    # BN folding: conv' = kernel*scale, bias = beta - mean*scale
    k0, b0 = fold_bn(tf_convs[0]["kernel"], tf_convs[0]["beta"],
                     tf_convs[0]["mean"], tf_convs[0]["var"])
    got = _template_entries(fe.params)
    np.testing.assert_allclose(
        got[f"{conv_paths[0]}/kernel"], k0, rtol=1e-5)
    np.testing.assert_allclose(got[f"{conv_paths[0]}/bias"], b0, rtol=1e-5)

    # wrong conv count fails loudly
    with pytest.raises(ValueError, match="out of sync"):
        build_entries(tf_convs[:-1], lk)
    # shuffled graph order (shape-incompatible pairing) fails loudly
    shuffled = [tf_convs[5]] + tf_convs[1:5] + [tf_convs[0]] + tf_convs[6:]
    with pytest.raises(ValueError, match="shape mismatch"):
        build_entries(shuffled, lk)


def test_extractor_mesh_sharded_matches_single(extractor):
    """Mesh-sharded activation pass (8-device CPU mesh) returns the
    same features as the single-device extractor; batch_size rounds up
    to a mesh multiple."""
    from dddpm_tpu.evaluation.inception import FeatureExtractor
    from dddpm_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    sharded = FeatureExtractor(batch_size=6, mesh=mesh)
    assert sharded.batch_size % mesh.devices.size == 0
    imgs = np.random.RandomState(9).randint(0, 255, (10, 16, 16, 3), np.uint8)
    ref = extractor(imgs)
    got = sharded(imgs)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-5)
