"""Mesh/sharding tests on the virtual 8-device CPU mesh: data-parallel
train step equals single-device results, sharded bulk sampling works."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dddpm_tpu.models.factory import build_model
from dddpm_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)
from dddpm_tpu.train.state import (
    create_optimizer,
    create_train_state,
    make_train_step,
)

CFG = {
    "model": "ddpm", "dataset": "synthetic", "image_size": 8,
    "batch_size": 16, "lr": 1e-3, "T": 10, "loss_type": "simple",
    "beta_schedule": "cosine", "loss_flat": "sum",
    "unet_chan": 8, "unet_dims": (1, 2), "unet_dropout": 0.0,
    "ema_decay": 0.995, "compute_dtype": "float32",
}


def test_mesh_creation(devices):
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    mesh2 = create_mesh((4,), devices=devices[:4])
    assert mesh2.devices.size == 4


def test_shard_batch_layout(devices):
    mesh = create_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding == batch_sharding(mesh)
    # each device holds 2 rows
    assert xs.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(xs), x)


@pytest.mark.slow
def test_data_parallel_step_matches_single_device(devices):
    """Same batch, same state: sharded-over-8 must equal single-device."""
    net, proc, init_fn, cfg = build_model(dict(CFG))
    tx = create_optimizer(cfg["lr"])
    state = create_train_state(cfg, init_fn, jax.random.PRNGKey(0), tx)
    step = make_train_step(proc, tx, grad_accum=2, ema_decay=0.995)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 8, 8, 3),
                               minval=-1, maxval=1)

    # single device
    s1, m1 = jax.jit(step)(state, batch)

    # 8-device mesh
    mesh = create_mesh()
    state8 = jax.device_put(state, replicated(mesh))
    batch8 = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    s8, m8 = jax.jit(step)(state8, batch8)

    np.testing.assert_allclose(float(m1["train_obj"]), float(m8["train_obj"]),
                               rtol=1e-5)
    # Adam amplifies reduction-order noise for near-zero grads: m/sqrt(v)
    # saturates to +-1, so tiny f32 psum differences move params by O(lr).
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_bulk_sampler_sharded(devices):
    from dddpm_tpu.sample import generate_samples

    net, proc, init_fn, cfg = build_model(dict(CFG))
    params = init_fn(jax.random.PRNGKey(0))
    mesh = create_mesh()
    params = replicate(params, mesh)
    samples, latents, timing = generate_samples(
        proc, params, mesh, jax.random.PRNGKey(1),
        fid_samples=24, batch_size=16, progress=False)
    assert samples.shape == (2, 16, 8, 8, 3)
    assert latents is None
    assert samples.min() >= 0.0 and samples.max() <= 255.0
    assert timing["imgs_per_sec"] > 0


def test_bulk_sampler_dddpm_returns_latents(devices):
    from dddpm_tpu.sample import generate_samples

    cfg = dict(CFG)
    cfg.update({
        "model": "dddpm", "image_size": 16, "n_downsamples": 1, "unet_in": 4,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 8, "d_n_blocks": 2, "u_n_blocks": 2,
        "ae_loss": True, "t_rec_max": 5, "force_latent": True,
    })
    net, proc, init_fn, cfg = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    mesh = create_mesh()
    params = replicate(params, mesh)
    samples, latents, _ = generate_samples(
        proc, params, mesh, jax.random.PRNGKey(1),
        fid_samples=8, batch_size=8, progress=False)
    assert samples.shape == (1, 8, 16, 16, 3)
    assert latents.shape == (1, 8, 8, 8, 4)


def test_graft_dryrun_multichip(devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_fsdp_sharding_specs(devices):
    from dddpm_tpu.parallel.fsdp import fsdp_sharding, shard_params_fsdp

    net, proc, init_fn, cfg = build_model(dict(CFG))
    params = init_fn(jax.random.PRNGKey(0))
    mesh = create_mesh()
    shardings = fsdp_sharding(params, mesh, min_size=512)

    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(
        x, jax.sharding.NamedSharding))
    n_sharded = 0
    for p, s in zip(flat_p, flat_s):
        if any(ax == "data" for ax in s.spec):
            n_sharded += 1
            ax = list(s.spec).index("data")
            assert p.shape[ax] % 8 == 0
    assert n_sharded > 0, "no parameter was sharded"

    sharded = shard_params_fsdp(params, mesh, min_size=512)
    for a, b in zip(jax.tree.leaves(sharded), flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_train_step_matches_replicated(devices):
    """FSDP-sharded state must produce the same step as replicated."""
    from dddpm_tpu.parallel.fsdp import shard_state_fsdp

    net, proc, init_fn, cfg = build_model(dict(CFG))
    tx = create_optimizer(cfg["lr"])
    state = create_train_state(cfg, init_fn, jax.random.PRNGKey(0), tx)
    step = make_train_step(proc, tx, grad_accum=2, ema_decay=0.995)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 8, 8, 3),
                               minval=-1, maxval=1)

    mesh = create_mesh()
    s_rep = jax.device_put(state, replicated(mesh))
    b8 = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    out_rep, m_rep = jax.jit(step)(s_rep, b8)

    s_fsdp = shard_state_fsdp(state, mesh, min_size=512)
    out_fsdp, m_fsdp = jax.jit(step)(s_fsdp, b8)

    np.testing.assert_allclose(float(m_rep["train_obj"]),
                               float(m_fsdp["train_obj"]), rtol=1e-5)
    # reduce-scatter vs all-reduce ordering perturbs near-zero grads;
    # Adam turns that into up-to-one-step (lr=1e-3) param deltas
    for a, b in zip(jax.tree.leaves(out_rep.params),
                    jax.tree.leaves(out_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1.1e-3)
    # sharding is preserved through the step (donated, same layout out)
    any_sharded = any(
        any(ax == "data" for ax in l.sharding.spec)
        for l in jax.tree.leaves(out_fsdp.params)
        if hasattr(l.sharding, "spec"))
    assert any_sharded


def test_initialize_distributed_single_process_noop():
    """No coordinator configured -> no-op, process index 0."""
    from dddpm_tpu.parallel.mesh import initialize_distributed

    assert initialize_distributed() == 0
    assert jax.process_count() == 1


def test_initialize_distributed_two_processes(tmp_path):
    """Multi-host entry point: two real processes join one JAX
    distributed client over a local coordinator (the CPU stand-in for
    a DCN-connected multi-host TPU slice)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import jax
jax.config.update("jax_platforms", "cpu")
from dddpm_tpu.parallel.mesh import initialize_distributed
pid = initialize_distributed("127.0.0.1:{port}", 2, int(sys.argv[1]))
assert pid == int(sys.argv[1]), pid
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # one CPU device per host
assert len(jax.local_devices()) == 1
print("OK", pid)
"""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK {i}" in out


def test_segmented_chain_bit_identical(devices):
    """chain_segments > 1 must be BIT-IDENTICAL to the monolithic scan
    (same post-split rng, per-step noise keyed fold_in(rng, t)), for
    both the plain DDPM and the dDDPM (x, z) sampler."""
    from dddpm_tpu.sample import make_bulk_sampler

    mesh = create_mesh()

    net, proc, init_fn, cfg = build_model(dict(CFG))
    params = replicate(init_fn(jax.random.PRNGKey(0)), mesh)
    rng = jax.random.PRNGKey(7)
    mono = make_bulk_sampler(proc, mesh, 16)(params, rng)
    for k in (2, 3):
        seg = make_bulk_sampler(proc, mesh, 16, chain_segments=k)(
            params, rng)
        np.testing.assert_array_equal(np.asarray(seg), np.asarray(mono))

    # prime chain length (early_stop=3 -> n=7) has no divisor in
    # [K, 2K]: exercises the unequal linspace-bounds fallback
    mono7 = make_bulk_sampler(proc, mesh, 16, early_stop=3)(params, rng)
    seg7 = make_bulk_sampler(proc, mesh, 16, early_stop=3,
                             chain_segments=2)(params, rng)
    np.testing.assert_array_equal(np.asarray(seg7), np.asarray(mono7))

    cfg = dict(CFG)
    cfg.update({
        "model": "dddpm", "image_size": 16, "n_downsamples": 1, "unet_in": 4,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 8, "d_n_blocks": 2, "u_n_blocks": 2,
        "ae_loss": True, "t_rec_max": 5, "force_latent": True,
    })
    net, proc, init_fn, cfg = build_model(cfg)
    params = replicate(init_fn(jax.random.PRNGKey(0)), mesh)
    x_m, z_m = make_bulk_sampler(proc, mesh, 8)(params, rng)
    x_s, z_s = make_bulk_sampler(proc, mesh, 8, chain_segments=4)(
        params, rng)
    np.testing.assert_array_equal(np.asarray(z_s), np.asarray(z_m))
    np.testing.assert_array_equal(np.asarray(x_s), np.asarray(x_m))
