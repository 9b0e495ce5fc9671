"""Gather-compacted recon branch of the AE dDDPM variant.

The reference zeroes the recon loss (value and gradient) wherever
t >= t_rec_max (/root/reference/models/diffusion/dddpm.py:119,161), and
in the autoencoder variant z is detached before the DDPM loss
(dddpm.py:164), so the resamplers' ONLY gradients come from the
t < t_rec_max samples (~10% of the batch at the reference recipe).
`DownsampleDiffusionAutoencoder.losses` with recon_compact=True runs
the resampler forward+backward on a static-capacity gather of exactly
those samples, with an exact lax.cond dense fallback on overflow.

These tests pin: the objective/metrics and all parameter gradients
match the dense branch; the overflow path takes the dense branch; the
capacity rule itself.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.models.dddpm import recon_capacity
from dddpm_tpu.models.factory import build_model

CFG = {
    "model": "dddpm", "dataset": "mnist", "image_size": 16,
    "T": 20, "loss_type": "simple", "beta_schedule": "cosine",
    "loss_flat": "sum", "unet_chan": 8, "unet_dims": (1, 2),
    "unet_dropout": 0.0, "unet_in": 4, "n_downsamples": 1,
    "d_mode": "convolutional_res", "u_mode": "convolutional_res",
    "d_dropout": 0, "d_chans": 8, "d_n_blocks": 2, "u_n_blocks": 2,
    "ae_loss": True, "t_rec_max": 2, "force_latent": True,
    "compute_dtype": "float32",
}
BATCH = 32  # capacity(32, 2/20) = 12 < 32 -> compact path active


@pytest.fixture(scope="module")
def model():
    net, proc, init_fn, cfg = build_model(dict(CFG))
    assert proc.recon_compact, "factory should enable compaction here"
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 16, 16, 1),
                           minval=-1, maxval=1)
    return proc, params, x


def test_capacity_rule():
    assert recon_capacity(32, 0.1) == 12      # reference recipe shape
    assert recon_capacity(32, 2 / 20) == 12
    assert recon_capacity(2, 0.5) == 2        # tiny batch -> dense
    assert recon_capacity(32, 1.0) == 32      # t_rec_max=-1 -> dense
    assert recon_capacity(192, 0.1) == 40
    # p > 1 (t_rec_max > T via --T CLI override) clamps instead of
    # raising a math domain error; gate-always-open == dense path
    assert recon_capacity(32, 100 / 50) == 32
    assert recon_capacity(32, -0.1) == 4      # degenerate, still valid
    for b in (8, 32, 192):
        for p in (0.05, 0.1, 0.5, 1.0):
            c = recon_capacity(b, p)
            assert 1 <= c <= b and (c % 4 == 0 or c == b)


def _grads_and_out(fn, params, rng, x, t):
    def obj(p):
        o, parts = fn(p, rng, x, t, train=False)
        return o, parts

    (o, parts), g = jax.value_and_grad(obj, has_aux=True)(params)
    return o, parts, g


def _assert_tree_close(a, b, rtol=2e-5, atol=1e-7):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_compact_matches_dense_values_and_grads(model):
    proc, params, x = model
    rng = jax.random.PRNGKey(3)
    # 5 masked samples (t < 2) scattered through the batch, count < cap
    t = np.full((BATCH,), 10, np.int32)
    t[[0, 7, 13, 14, 31]] = [0, 1, 0, 1, 1]
    t = jnp.asarray(t)

    o_c, p_c, g_c = _grads_and_out(proc.losses, params, rng, x, t)
    o_d, p_d, g_d = _grads_and_out(proc._losses_dense, params, rng, x, t)

    np.testing.assert_allclose(float(o_c), float(o_d), rtol=2e-6)
    np.testing.assert_allclose(float(p_c["recon"]), float(p_d["recon"]),
                               rtol=2e-6)
    # DDPM leg shares rngs -> latent loss identical
    np.testing.assert_allclose(float(p_c["latent"]), float(p_d["latent"]),
                               rtol=1e-7)
    _assert_tree_close(g_c, g_d)


def test_compact_zero_masked_count(model):
    proc, params, x = model
    t = jnp.full((BATCH,), 10, jnp.int32)  # nothing below t_rec_max
    o_c, p_c, g_c = _grads_and_out(proc.losses, params,
                                   jax.random.PRNGKey(4), x, t)
    assert float(p_c["recon"]) == 0.0
    # resampler grads are exactly zero (recon is their only source)
    for name in ("downsample", "upsample"):
        leaf_max = max(float(np.abs(np.asarray(g)).max())
                       for g in jax.tree.leaves(g_c["params"][name]))
        assert leaf_max == 0.0, f"{name} got gradient with recon gated off"


def test_overflow_falls_back_to_dense_exactly(model):
    proc, params, x = model
    rng = jax.random.PRNGKey(5)
    cap = recon_capacity(BATCH, proc.t_rec_max / proc.timesteps)
    # more masked samples than capacity -> lax.cond takes the dense branch
    t = np.full((BATCH,), 10, np.int32)
    t[: cap + 4] = 1
    t = jnp.asarray(t)

    o_c, p_c, g_c = _grads_and_out(proc.losses, params, rng, x, t)
    o_d, p_d, g_d = _grads_and_out(proc._losses_dense, params, rng, x, t)
    np.testing.assert_allclose(float(o_c), float(o_d), rtol=1e-6)
    np.testing.assert_allclose(float(p_c["recon"]), float(p_d["recon"]),
                               rtol=1e-6)
    _assert_tree_close(g_c, g_d, rtol=1e-5)


def test_loss_fn_end_to_end_matches_dense(model):
    """Through loss_fn (t sampled from rng) under jit, compact == dense."""
    proc, params, x = model

    compact = jax.jit(lambda p, r: proc.loss_fn(p, r, x, True))
    obj_c, m_c = compact(params, jax.random.PRNGKey(6))

    proc.recon_compact = False
    try:
        dense = jax.jit(lambda p, r: proc.loss_fn(p, r, x, True))
        obj_d, m_d = dense(params, jax.random.PRNGKey(6))
    finally:
        proc.recon_compact = True
    np.testing.assert_allclose(float(obj_c), float(obj_d), rtol=2e-5)
    np.testing.assert_allclose(float(m_c["train_recon"]),
                               float(m_d["train_recon"]), rtol=2e-5)


@pytest.mark.slow
def test_compact_sharded_matches_dense_single_device(model):
    """Compact losses+grads under an 8-device batch-sharded mesh equal
    the single-device dense branch (the argsort/gather/cond must
    partition correctly under SPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dddpm_tpu.parallel.mesh import create_mesh, replicated

    proc, params, x = model
    rng = jax.random.PRNGKey(9)
    t = np.full((BATCH,), 10, np.int32)
    t[[2, 9, 17, 30]] = [0, 1, 1, 0]
    t = jnp.asarray(t)

    def obj(p, xx, tt):
        o, _ = proc.losses(p, rng, xx, tt, train=False)
        return o

    o1, g1 = jax.value_and_grad(obj)(params, x, t)

    mesh = create_mesh()
    p8 = jax.device_put(params, replicated(mesh))
    x8 = jax.device_put(x, NamedSharding(mesh, P("data")))
    t8 = jax.device_put(t, NamedSharding(mesh, P("data")))
    o8, g8 = jax.jit(jax.value_and_grad(obj))(p8, x8, t8)

    np.testing.assert_allclose(float(o1), float(o8), rtol=2e-5)
    # cross-device reduction order adds f32 noise, amplified on grad
    # elements where per-sample contributions cancel (same class of
    # tolerance as the DP-equivalence test in test_parallel.py); a
    # masking/gather bug would be O(1) relative
    _assert_tree_close(g1, g8, rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_compact_gather_is_not_shard_local_hlo(model):
    """Pin the HLO fact behind the trainer's mesh gate: under a
    batch-sharded 8-device mesh the compact branch's argsort/take
    forces all-gather collectives that the dense branch never emits
    (the image batch is gathered across devices to build the compacted
    sub-batch).  This is WHY compaction is a single-chip optimization."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dddpm_tpu.parallel.mesh import create_mesh, replicated

    proc, params, x = model
    rng = jax.random.PRNGKey(11)
    t = jnp.asarray(np.full((BATCH,), 10, np.int32))

    mesh = create_mesh()
    p8 = jax.device_put(params, replicated(mesh))
    x8 = jax.device_put(x, NamedSharding(mesh, P("data")))
    t8 = jax.device_put(t, NamedSharding(mesh, P("data")))

    def compile_text(fn):
        def obj(p, xx, tt):
            o, _ = fn(p, rng, xx, tt, train=False)
            return o

        return (jax.jit(jax.value_and_grad(obj))
                .lower(p8, x8, t8).compile().as_text())

    compact_txt = compile_text(proc.losses)
    dense_txt = compile_text(proc._losses_dense)
    assert compact_txt.count("all-gather") > 0, (
        "compact branch no longer emits all-gathers under a sharded "
        "batch — if XLA now partitions the gather shard-locally, the "
        "trainer's multi-device compaction gate can be removed")
    assert dense_txt.count("all-gather") == 0
    assert dense_txt.count("all-to-all") == 0


def test_trainer_gates_compaction_on_multidevice_mesh(tmp_path):
    """The trainer (8-device CPU mesh in tests) must run the dense
    branch even when the factory enabled compaction."""
    from dddpm_tpu.train.trainer import setup_trainer

    cfg = dict(CFG)
    cfg.update({"dataset": "synthetic", "batch_size": 8, "n_steps": 1,
                "lr": 1e-3, "ema_decay": 0.995, "val_split": 0,
                "rnd_flip": False, "grad_accum": 2})
    trainer, _ = setup_trainer(cfg, mute=True, workdir=str(tmp_path))
    assert trainer.mesh.devices.size > 1
    assert trainer.process.recon_compact is False


def test_factory_gates_compaction():
    cfg = dict(CFG)
    cfg["recon_compact"] = False
    _, proc, _, _ = build_model(cfg)
    assert not proc.recon_compact

    cfg = dict(CFG)
    cfg["d_dropout"] = 0.1  # stochastic resamplers -> dense only
    _, proc, _, _ = build_model(cfg)
    assert not proc.recon_compact

    cfg = dict(CFG)
    cfg["ae_loss"] = False  # joint variant: recon grads flow via UNet
    _, proc, _, _ = build_model(cfg)
    assert not proc.recon_compact
