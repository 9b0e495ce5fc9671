"""dDDPM tests: resampler shapes/params, latent chain, loss gating,
autoencoder stop-gradient semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.models.factory import build_model, param_count
from dddpm_tpu.models.resample import (
    ConvResNet,
    Interpolate,
    SimpleDownConv,
    SimpleUpConv,
)

# Golden counts from the reference torch ConvResNet/SimpleConv
# (models/downsampled/convblocks.py) for identical configs.
REF_COUNTS = {
    "down_convres_64_3_8_n2_b3": 136_904,
    "up_convres_64_8_3_n2_b3": 136_899,
    "down_convres_64_3_8_n3_b3": 204_968,
    "simpledown_8_3_2": 808,
    "simpleup_8_3_2": 1_419,
}


def _init(mod, shape):
    x = jnp.zeros(shape)
    return mod.init(jax.random.PRNGKey(0), x)


def test_convresnet_param_parity_and_shapes():
    down = ConvResNet(64, 3, 8, 2, upsample=False, n_blocks=3)
    p = _init(down, (1, 16, 16, 3))
    assert param_count(p) == REF_COUNTS["down_convres_64_3_8_n2_b3"]
    out = down.apply(p, jnp.zeros((2, 16, 16, 3)))
    assert out.shape == (2, 4, 4, 8)

    up = ConvResNet(64, 8, 3, 2, upsample=True, n_blocks=3)
    p = _init(up, (1, 4, 4, 8))
    assert param_count(p) == REF_COUNTS["up_convres_64_8_3_n2_b3"]
    out = up.apply(p, jnp.zeros((2, 4, 4, 8)))
    assert out.shape == (2, 16, 16, 3)

    down3 = ConvResNet(64, 3, 8, 3, upsample=False, n_blocks=3)
    p = _init(down3, (1, 32, 32, 3))
    assert param_count(p) == REF_COUNTS["down_convres_64_3_8_n3_b3"]


def test_simple_convs_param_parity_and_shapes():
    d = SimpleDownConv(8, 3, 2)
    p = _init(d, (1, 16, 16, 3))
    assert param_count(p) == REF_COUNTS["simpledown_8_3_2"]
    assert d.apply(p, jnp.zeros((1, 16, 16, 3))).shape == (1, 4, 4, 8)

    u = SimpleUpConv(8, 3, 2)
    p = _init(u, (1, 4, 4, 8))
    assert param_count(p) == REF_COUNTS["simpleup_8_3_2"]
    assert u.apply(p, jnp.zeros((1, 4, 4, 8))).shape == (1, 16, 16, 3)


def test_interpolate_shapes():
    mod = Interpolate(size=(4, 4))
    p = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    out = mod.apply(p, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (8, 8)),    # the x1 'deterministic' downsample path
    ((8, 8), (16, 16)),    # the matching upsample path
    ((7, 5), (5, 9)),      # non-square, odd, mixed up/down per axis
    ((4, 4), (1, 1)),      # out==1 edge case (scale collapses to 0)
    ((1, 3), (5, 7)),      # in==1: all taps clamp to the single row
])
def test_interpolate_matches_torch_bicubic_align_corners(in_hw, out_hw):
    """Exact parity with the reference's deterministic resample:
    F.interpolate(mode='bicubic', align_corners=True)
    (/root/reference/models/downsampled/convblocks.py:8-26)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    mod = Interpolate(size=out_hw)
    p = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, *in_hw, 3)))
    ours = np.asarray(mod.apply(p, jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    theirs = torch.nn.functional.interpolate(
        xt, size=out_hw, mode="bicubic", align_corners=True)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


CFG = {
    "model": "dddpm", "dataset": "mnist", "image_size": 16,
    "T": 20, "loss_type": "simple", "beta_schedule": "cosine",
    "loss_flat": "sum", "unet_chan": 8, "unet_dims": (1, 2),
    "unet_dropout": 0.0, "unet_in": 4, "n_downsamples": 1,
    "d_mode": "convolutional_res", "u_mode": "convolutional_res",
    "d_dropout": 0, "d_chans": 8, "d_n_blocks": 2, "u_n_blocks": 2,
    "ae_loss": True, "t_rec_max": 10, "force_latent": True,
    "compute_dtype": "float32",
}


@pytest.fixture(scope="module")
def dddpm():
    net, proc, init_fn, cfg = build_model(dict(CFG))
    params = init_fn(jax.random.PRNGKey(0))
    return net, proc, params


def test_latent_shapes(dddpm):
    _, proc, params = dddpm
    assert proc.sample_shape == (8, 8, 4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    z = proc.rescaled_downsample(params, x)
    assert z.shape == (2, 8, 8, 4)
    # force_latent tanh squash keeps z in [-1, 1]
    assert np.abs(np.asarray(z)).max() <= 1.0
    x_up = proc.rescaled_upsample(params, z)
    assert x_up.shape == (2, 16, 16, 1)
    assert np.abs(np.asarray(x_up)).max() <= 1.0


def test_sample_returns_both_spaces(dddpm):
    _, proc, params = dddpm
    x_s, z_s = proc.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert x_s.shape == (2, 16, 16, 1)
    assert z_s.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(x_s)).all()


@pytest.mark.slow
def test_reconstruct_returns_both_spaces(dddpm):
    _, proc, params = dddpm
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 1))
    x_r, z_r = proc.reconstruct(params, jax.random.PRNGKey(4), x, 3)
    assert x_r.shape == (3, 16, 16, 1)
    assert z_r.shape == (3, 8, 8, 4)


@pytest.mark.slow
def test_loss_fn_metrics(dddpm):
    _, proc, params = dddpm
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 16, 16, 1),
                           minval=-1, maxval=1)
    obj, metrics = proc.loss_fn(params, jax.random.PRNGKey(6), x, train=False)
    assert set(metrics) == {"train_obj", "train_latent", "train_recon"}
    np.testing.assert_allclose(
        float(obj),
        float(metrics["train_latent"]) + float(metrics["train_recon"]),
        rtol=1e-5,
    )


def test_recon_loss_gated_by_t(dddpm):
    _, proc, params = dddpm
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    # all t >= t_rec_max -> recon contributes 0
    t_hi = jnp.array([15, 19])
    _, parts = proc.losses(params, jax.random.PRNGKey(8), x, t_hi, train=False)
    assert float(parts["recon"]) == 0.0
    t_lo = jnp.array([0, 5])
    _, parts = proc.losses(params, jax.random.PRNGKey(8), x, t_lo, train=False)
    assert float(parts["recon"]) > 0.0


@pytest.mark.slow
def test_autoencoder_stops_gradient_to_downsampler_from_ddpm_loss(dddpm):
    """In the AE variant the latent DDPM loss must NOT produce grads on
    the downsampler (z is detached); recon loss must."""
    _, proc, params = dddpm
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    t_hi = jnp.array([15, 19])  # recon gated off -> only DDPM loss active

    def obj_hi(p):
        obj, _ = proc.losses(p, jax.random.PRNGKey(10), x, t_hi, train=False)
        return obj

    grads = jax.grad(obj_hi)(params)
    down_grads = grads["params"]["downsample"]
    leaf_max = max(float(np.abs(np.asarray(g)).max())
                   for g in jax.tree.leaves(down_grads))
    assert leaf_max == 0.0, "DDPM loss leaked gradients through detached z"

    t_lo = jnp.array([0, 1])  # recon active -> downsampler gets gradients

    def obj_lo(p):
        obj, _ = proc.losses(p, jax.random.PRNGKey(10), x, t_lo, train=False)
        return obj

    grads = jax.grad(obj_lo)(params)
    down_grads = grads["params"]["downsample"]
    leaf_max = max(float(np.abs(np.asarray(g)).max())
                   for g in jax.tree.leaves(down_grads))
    assert leaf_max > 0.0


def test_non_ae_variant_propagates_ddpm_grads_to_downsampler():
    cfg = dict(CFG)
    cfg["ae_loss"] = False
    net, proc, init_fn, _ = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    t_hi = jnp.array([15, 19])  # recon gated off

    def obj(p):
        o, _ = proc.losses(p, jax.random.PRNGKey(2), x, t_hi, train=False)
        return o

    grads = jax.grad(obj)(params)["params"]["downsample"]
    leaf_max = max(float(np.abs(np.asarray(g)).max())
                   for g in jax.tree.leaves(grads))
    assert leaf_max > 0.0  # joint variant trains the downsampler via DDPM


def test_test_losses_in_latent_space(dddpm):
    _, proc, params = dddpm
    x = jax.random.uniform(jax.random.PRNGKey(11), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    out = proc.test_losses(params, jax.random.PRNGKey(12), x)
    assert out["vlb_t"].shape == (2, CFG["T"])
    assert np.isfinite(np.asarray(out["vlb"])).all()


def test_ddpm_factory_plain():
    cfg = {
        "model": "ddpm", "dataset": "mnist", "image_size": 16, "T": 20,
        "loss_type": "simple", "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 8, "unet_dims": (1, 2), "unet_dropout": 0.0,
        "compute_dtype": "float32",
    }
    net, proc, init_fn, out_cfg = build_model(cfg)
    assert out_cfg["unet_in"] == 1  # mnist is single channel
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))
    obj, metrics = proc.loss_fn(params, jax.random.PRNGKey(2), x, train=False)
    assert np.isfinite(float(obj))
    assert set(metrics) == {"train_obj"}


def test_ddim_sample_returns_both_spaces(dddpm):
    _, proc, params = dddpm
    x_s, z_s = proc.ddim_sample(params, jax.random.PRNGKey(30), batch_size=2,
                                num_steps=5)
    assert x_s.shape == (2, 16, 16, 1)
    assert z_s.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(x_s)).all()


def test_reshape_mean_pool_matches_avg_pool():
    """ConvResBlock's downscale (reshape + mean) == nn.avg_pool 2x2/2 —
    the reshape form is used for its cheap VJP (no reduce_window)."""
    import jax.numpy as jnp
    from flax import linen as nn

    rng = np.random.RandomState(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(2, 16, 16, 8), dtype)
        want = nn.avg_pool(x, (2, 2), strides=(2, 2))
        b, h, w, c = x.shape
        got = (x.reshape(b, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4))
               * 0.25).astype(dtype)
        bf16 = dtype == jnp.bfloat16
        # bf16: accumulation-order rounding only (one ulp); f32 exact
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-2 if bf16 else 1e-6,
                                   atol=1e-2 if bf16 else 0)


def test_dddpm_sample_every_latent_snapshots(dddpm):
    """dDDPM sample(every=k) returns (x, z, z_snapshots) with snapshots
    in latent space; x/z match the snapshot-free call bit-for-bit."""
    _, proc, params = dddpm
    rng = jax.random.PRNGKey(11)
    x_p, z_p = proc.sample(params, rng, batch_size=2)
    x, z, z_snaps = proc.sample(params, rng, batch_size=2, every=5)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_p))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_p))
    assert z_snaps.shape[1:] == z.shape
    np.testing.assert_array_equal(np.asarray(z_snaps[-1]), np.asarray(z))
