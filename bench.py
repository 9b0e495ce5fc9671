"""Benchmark: the repo's headline metrics.

1. dDDPM x2 CelebA-HQ-256 batch sampling throughput (1000-step reverse
   chain in the 128^2 latent space + conv upsample to 256^2).
   Reference baseline: 97 s for a 192-image batch on the reference's
   GPU (notebooks Sampling Time Visualizations, st_x2; BASELINE.md) =
   1.979 imgs/sec.  vs_baseline = ours / reference.
2. dDDPM x3 CelebA-HQ-256 train-step throughput (BASELINE.json's other
   north-star: "train imgs/sec"; the 800k-step bs-32 recipe,
   README.md:23) — reported in the same record under "train".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"train": {...}}.  Runs on whatever jax.devices() provides (the real TPU
chip under the driver).  Random-init weights — throughput does not
depend on training.

Each attempt runs in a fresh subprocess: after a TPU OOM the axon
device stays wedged for the rest of the process, so in-process retries
always fail.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Published reference wall-clocks for 192-image 256^2 batches
# (notebooks Sampling Time Visualizations, st_x2/x3/x4; BASELINE.md)
REFERENCE_IMGS_PER_SEC = 192.0 / 97.0   # dDDPM x2 (the headline)
REFERENCE_X3 = 192.0 / 28.0             # dDDPM x3
REFERENCE_X4 = 192.0 / 14.0             # dDDPM x4


def _sample_config(batch_size: int, n_downsamples: int = 1) -> dict:
    return {
        "model": "dddpm", "dataset": "celeba_hq", "image_size": 256,
        "batch_size": batch_size, "T": 1000, "loss_type": "simple",
        "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
        "unet_in": 8, "n_downsamples": n_downsamples,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 64, "d_n_blocks": 3, "u_n_blocks": 3,
        "ae_loss": True, "t_rec_max": 100, "force_latent": True,
        "compute_dtype": "bfloat16",
    }


def _enable_compile_cache():
    """Persistent XLA compile cache: the 1000-step chain compile takes
    minutes on a single host core; repeated bench runs skip it."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _auto_segments(batch_size: int, n_downsamples: int = 1) -> int:
    """Split the 1000-step chain so no single device program exceeds
    ~30 s: the axon tunnel kills programs in the 45-65 s range
    (measured bisection, BENCH_NOTES r4) — the r3 'OOM at bs 112/128'
    was actually this wall (AOT memory analysis shows only 2.7 GB HBM
    at bs 128).  Per-image chain cost is measured per latent size
    (x2 128^2: 0.58 s; x3 32^2: 0.04 s; x4 16^2: 0.012 s);
    segmentation is bit-identical (see make_bulk_sampler)."""
    est_s_per_img = {1: 0.58, 3: 0.04, 4: 0.012}.get(n_downsamples, 0.58)
    est_rep_s = est_s_per_img * batch_size
    return max(1, int(est_rep_s / 30) + 1)


def run_sampling(batch_size: int, n_downsamples: int = 1):
    import jax

    _enable_compile_cache()
    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.parallel.mesh import create_mesh
    from dddpm_tpu.sample import make_bulk_sampler

    net, process, init_fn, config = build_model(
        _sample_config(batch_size, n_downsamples))
    params = init_fn(jax.random.PRNGKey(0))
    mesh = create_mesh()
    segments = int(os.environ.get("BENCH_SEGMENTS", "0")) or _auto_segments(
        batch_size, n_downsamples)
    sampler = make_bulk_sampler(process, mesh, batch_size,
                                chain_segments=segments)

    # TPU hardware RNG for per-step sampling noise (threefry costs
    # ~0.25 ms/step more at bs 96; same N(0,1) distribution)
    rng = jax.random.key(0, impl="rbg")
    out = sampler(params, rng)           # compile + warmup
    jax.block_until_ready(out)
    # >=3 timed reps: run-to-run tunnel variance is ~3%, a single rep
    # can move vs_baseline by a point (VERDICT r2); occasional cold
    # outliers reach -17%, hence 5 reps + trimmed mean in emit()
    reps = []
    for i in range(int(os.environ.get("BENCH_REPS", "5"))):
        start = time.perf_counter()
        out = sampler(params, jax.random.fold_in(rng, i + 1))
        jax.block_until_ready(out)
        reps.append(batch_size / (time.perf_counter() - start))
    return reps, len(jax.devices())


def run_train(batch_size: int, iters: int = 8):
    """dDDPM x3 256^2 jitted train step (accum x2, clip, Adam, EMA)."""
    import jax

    _enable_compile_cache()
    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.train.state import (
        create_optimizer, create_train_state, make_train_step)

    config = dict(_sample_config(batch_size))
    config.update({"n_downsamples": 3, "lr": 2e-4})
    net, process, init_fn, config = build_model(config)
    tx = create_optimizer(config["lr"])
    state = create_train_state(config, init_fn, jax.random.PRNGKey(0), tx)
    step_fn = jax.jit(make_train_step(process, tx, grad_accum=2,
                                      ema_decay=0.995), donate_argnums=0)
    batch = jax.random.uniform(jax.random.PRNGKey(1),
                               (2, batch_size, 256, 256, 3),
                               minval=-1.0, maxval=1.0)
    state, metrics = step_fn(state, batch)  # compile + warmup
    _ = float(metrics["train_obj"])
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["train_obj"])         # device sync
    dt = (time.perf_counter() - start) / iters
    return 2 * batch_size / dt, len(jax.devices())


def emit(mode: str, batch_size: int):
    if mode in ("--run", "--run-x3", "--run-x4"):
        n_down = {"--run": 1, "--run-x3": 3, "--run-x4": 4}[mode]
        ref = {"--run": REFERENCE_IMGS_PER_SEC, "--run-x3": REFERENCE_X3,
               "--run-x4": REFERENCE_X4}[mode]
        reps, n_chips = run_sampling(batch_size, n_down)
        per_chip = [r / n_chips for r in reps]
        # trimmed mean (drop min and max when >=4 reps): the tunnel
        # occasionally produces a single cold rep ~17% low; all raw
        # reps stay in the record for transparency
        kept = (sorted(per_chip)[1:-1] if len(per_chip) >= 4
                else per_chip)
        value = sum(kept) / len(kept)
        spread = (max(kept) - min(kept)) / 2
        xn = {1: "x2", 3: "x3", 4: "x4"}[n_down]
        print(json.dumps({
            "metric": f"dDDPM_{xn}_256px_sampling_imgs_per_sec_per_chip",
            "value": round(value, 4),
            "unit": f"imgs/sec/chip (1000-step reverse chain, bs {batch_size}, "
                    f"bf16, fused attention; trimmed mean of {len(reps)} reps, "
                    f"±{spread:.4f})",
            "vs_baseline": round(value / ref, 4),
            "reps": [round(v, 4) for v in per_chip],
        }))
    else:
        imgs_per_sec, n_chips = run_train(batch_size)
        value = imgs_per_sec / n_chips
        print(json.dumps({
            "metric": "dDDPM_x3_256px_train_imgs_per_sec_per_chip",
            "value": round(value, 4),
            "unit": f"imgs/sec/chip (jitted step: accum x2, clip, Adam, "
                    f"EMA; bs {batch_size}, bf16)",
            # the reference never published train imgs/sec (BASELINE.md
            # has only sampling wall-clocks), so there is no vs_baseline
            # for this record by construction
            "vs_baseline": None,
        }))


def _subprocess_attempts(mode: str, start_batch: int, min_batch: int = 4):
    """Run `bench.py <mode> <bs>` with an OOM-halving retry ladder."""
    batch_size = start_batch
    while batch_size >= min_batch:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode,
             str(batch_size)],
            capture_output=True, text=True, timeout=3000)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        print(f"# {mode} batch {batch_size} failed, retrying at "
              f"{batch_size // 2}", file=sys.stderr)
        batch_size //= 2
    return None


def main():
    if len(sys.argv) > 2 and sys.argv[1] in (
            "--run", "--run-x3", "--run-x4", "--train-run"):
        emit(sys.argv[1], int(sys.argv[2]))
        return

    sampling = _subprocess_attempts(
        "--run", int(os.environ.get("BENCH_BATCH", "96")))
    if sampling is None:
        raise RuntimeError("could not run the sampling benchmark even at bs 4")
    train = _subprocess_attempts(
        "--train-run", int(os.environ.get("BENCH_TRAIN_BATCH", "32")))
    if train is not None:
        sampling["train"] = train
    # the reference's other two published sampling configs, at its own
    # protocol batch (192): the x3/x4 latents (32^2/16^2) are where the
    # chip's small-map throughput beats the A100 outright
    for mode, key in (("--run-x3", "x3_sampling"),
                      ("--run-x4", "x4_sampling")):
        rec = _subprocess_attempts(
            mode, int(os.environ.get("BENCH_XN_BATCH", "192")))
        if rec is not None:
            sampling[key] = rec
    print(json.dumps(sampling))


if __name__ == "__main__":
    main()
