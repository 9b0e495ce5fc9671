"""Tests for the opt-in int8 (W8A8) conv serving mode (ops/quant.py,
quantize.py).

The quantized path is a TPU serving extension with no reference
equivalent; these tests pin (a) the measured shape gate, (b) the
quantization error bound, (c) calibration mechanics through the flax
"quant" collection, (d) end-to-end closeness of a quantized sampling
chain to the bf16 chain, and (e) the training refusal.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.models.blocks import Conv3x3Params
from dddpm_tpu.ops.quant import (
    act_scale_from_amax,
    int8_conv,
    quant_conv_wins,
    quantize_act,
    quantize_weight,
)

jax.config.update("jax_platforms", "cpu")


class TestGate:
    def test_winning_shapes(self):
        # measured winners (results/probe_int8_static.json)
        assert quant_conv_wins(3, 128, 128, 128, 1)
        assert quant_conv_wins(3, 64, 256, 256, 1)
        assert quant_conv_wins(3, 16, 256, 256, 1)
        assert quant_conv_wins(2, 64, 256, 256, 1)

    def test_losing_shapes(self):
        assert not quant_conv_wins(3, 64, 128, 256, 1)   # expanding
        assert not quant_conv_wins(3, 64, 256, 128, 1)   # reducing
        assert not quant_conv_wins(3, 64, 128, 128, 2)   # strided
        assert not quant_conv_wins(3, 128, 8, 128, 1)    # tiny cin
        assert not quant_conv_wins(1, 128, 128, 128, 1)  # 1x1


class TestQuantOps:
    def test_weight_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(3, 3, 32, 16)), jnp.float32)
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8 and ws.shape == (16,)
        err = np.abs(np.asarray(wq, np.float32) * np.asarray(ws) - np.asarray(w))
        # symmetric round-to-nearest: |err| <= scale/2 per channel
        assert (err <= np.asarray(ws)[None, None, None] / 2 + 1e-7).all()

    def test_act_quant_saturates_to_pm127(self):
        x = jnp.asarray([[-10.0, 0.0, 10.0]])
        xq = quantize_act(x, act_scale_from_amax(jnp.float32(5.0)))
        assert np.asarray(xq).min() == -127 and np.asarray(xq).max() == 127

    def test_int8_conv_error_bound(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
        amax = jnp.max(jnp.abs(x))
        y_q = int8_conv(x, w, amax)
        y_f = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        rel = (np.linalg.norm(np.asarray(y_q - y_f))
               / np.linalg.norm(np.asarray(y_f)))
        # per-tensor 8-bit: ~1e-2 relative error at 128 input channels
        assert rel < 0.02, rel


def _apply_conv(quant, x, skip=None, mutable=False, variables=None):
    cin = x.shape[-1] + (0 if skip is None else skip.shape[-1])
    mod = Conv3x3Params(features=x.shape[-1], in_features=cin,
                        dtype=jnp.float32, quant=quant)
    if variables is None:
        variables = mod.init(jax.random.PRNGKey(0), x, skip)
    if mutable:
        return mod, variables, *mod.apply(variables, x, skip,
                                          mutable=["quant"])
    return mod, variables, mod.apply(variables, x, skip)


class TestConvModule:
    def test_calibration_records_amax(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)) * 3.0, jnp.float32)
        mod, vs, _, upd = _apply_conv("int8", x, mutable=True)
        amax = float(jax.tree_util.tree_leaves(upd["quant"])[0])
        assert amax == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)

    def test_serve_close_to_bf16_path(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
        mod, vs, _, upd = _apply_conv("int8", x, mutable=True)
        vs = {"params": vs["params"], "quant": upd["quant"]}
        _, _, y_q = _apply_conv("int8", x, variables=vs)
        _, _, y_f = _apply_conv(None, x,
                                variables={"params": vs["params"]})
        rel = (np.linalg.norm(np.asarray(y_q - y_f))
               / np.linalg.norm(np.asarray(y_f)))
        assert rel < 0.02, rel

    def test_split_skip_has_per_operand_scales(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
        skip = jnp.asarray(rng.normal(size=(2, 8, 8, 128)) * 10.0,
                           jnp.float32)
        mod = Conv3x3Params(features=128, in_features=256,
                            dtype=jnp.float32, quant="int8")
        vs = mod.init(jax.random.PRNGKey(0), x, skip)
        _, upd = mod.apply(vs, x, skip, mutable=["quant"])
        q = upd["quant"]
        names = set(jax.tree_util.tree_flatten_with_path(q)[0][i][0][-1].key
                    for i in range(len(jax.tree_util.tree_leaves(q))))
        # NOTE: each 128->128 half of the split 256->128 kernel is
        # channel-PRESERVING from the operand's view, so both halves
        # quantize and each records its own scale
        assert names == {"amax_x", "amax_skip"}
        leaves = {p[-1].key: float(v) for p, v in
                  jax.tree_util.tree_flatten_with_path(q)[0]}
        assert leaves["amax_skip"] > 5 * leaves["amax_x"]

    def test_gated_out_site_creates_no_quant_state(self):
        x = jnp.zeros((1, 8, 8, 8), jnp.float32)  # cin 8 -> gated out
        mod = Conv3x3Params(features=8, in_features=8, quant="int8")
        vs = mod.init(jax.random.PRNGKey(0), x)
        assert "quant" not in vs


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def cfg(self):
        return {
            "model": "dddpm", "dataset": "celeba_hq", "image_size": 16,
            "batch_size": 4, "T": 20, "loss_type": "simple",
            "beta_schedule": "cosine", "loss_flat": "sum",
            "unet_chan": 128, "unet_dims": (1, 2), "unet_dropout": 0.0,
            "unet_in": 8, "n_downsamples": 1,
            "d_mode": "convolutional_res", "u_mode": "convolutional_res",
            "d_dropout": 0, "d_chans": 16, "d_n_blocks": 1,
            "u_n_blocks": 1, "ae_loss": True, "t_rec_max": 5,
            "force_latent": True, "compute_dtype": "bfloat16",
            "conv_quant": "int8",
        }

    def test_quantized_chain_close_to_bf16(self, cfg):
        from dddpm_tpu.models.factory import build_model
        from dddpm_tpu.quantize import maybe_calibrate
        from dddpm_tpu.parallel.mesh import create_mesh
        from dddpm_tpu.sample import make_bulk_sampler

        net, process, init_fn, cfg = build_model(dict(cfg))
        vs = init_fn(jax.random.PRNGKey(0))
        assert "quant" in vs
        vs = maybe_calibrate(cfg, net, process, dict(vs),
                             jax.random.PRNGKey(1), batch_size=2)
        amaxes = [float(v) for v in
                  jax.tree_util.tree_leaves(vs["quant"])]
        assert min(amaxes) > 0.0

        mesh = create_mesh()
        x_q, _ = make_bulk_sampler(process, mesh, 8)(
            vs, jax.random.PRNGKey(2))

        cfg_b = dict(cfg)
        cfg_b.pop("conv_quant")
        _, proc_b, _, _ = build_model(cfg_b)
        x_b, _ = make_bulk_sampler(proc_b, mesh, 8)(
            {"params": vs["params"]}, jax.random.PRNGKey(2))
        rel = (np.linalg.norm(np.asarray(x_q, np.float32)
                              - np.asarray(x_b, np.float32))
               / np.linalg.norm(np.asarray(x_b, np.float32)))
        # 20 quantized reverse steps stay within a few percent of the
        # bf16 chain on random-init params (measured ~0.03)
        assert rel < 0.10, rel

    def test_maybe_calibrate_skips_when_calibrated(self, cfg):
        from dddpm_tpu.models.factory import build_model
        from dddpm_tpu.quantize import maybe_calibrate

        net, process, init_fn, cfg = build_model(dict(cfg))
        vs = init_fn(jax.random.PRNGKey(0))
        calibrated = {
            "params": vs["params"],
            "quant": jax.tree.map(lambda v: jnp.ones_like(v),
                                  vs["quant"]),
        }
        out = maybe_calibrate(cfg, net, process, calibrated,
                              jax.random.PRNGKey(1))
        assert out is calibrated

    def test_trainer_refuses_conv_quant(self, cfg, tmp_path):
        from dddpm_tpu.train.trainer import setup_trainer

        bad = dict(cfg)
        bad.update({"lr": 1e-4})
        with pytest.raises(ValueError, match="serving-only"):
            setup_trainer(bad, mute=True, workdir=str(tmp_path),
                          n_samples=1)
