"""Benchmark: the repo's headline metric — dDDPM x2 CelebA-HQ-256
batch sampling throughput (1000-step reverse chain in the 128^2 latent
space + conv upsample to 256^2).

Reference baseline: 97 s for a 192-image batch on the reference's GPU
(notebooks Sampling Time Visualizations, st_x2; BASELINE.md) =
1.979 imgs/sec.  vs_baseline = ours / reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (the real TPU chip under the
driver). Random-init weights — throughput does not depend on training.

Each batch-size attempt runs in a fresh subprocess: after a TPU OOM the
axon device stays wedged for the rest of the process, so in-process
retries always fail.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_IMGS_PER_SEC = 192.0 / 97.0  # dDDPM x2 256^2, BASELINE.md


def run(batch_size: int):
    import jax
    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.parallel.mesh import create_mesh
    from dddpm_tpu.sample import make_bulk_sampler

    config = {
        "model": "dddpm", "dataset": "celeba_hq", "image_size": 256,
        "batch_size": batch_size, "T": 1000, "loss_type": "simple",
        "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
        "unet_in": 8, "n_downsamples": 1,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 64, "d_n_blocks": 3, "u_n_blocks": 3,
        "ae_loss": True, "t_rec_max": 100, "force_latent": True,
        "compute_dtype": "bfloat16",
    }
    net, process, init_fn, config = build_model(config)
    params = init_fn(jax.random.PRNGKey(0))
    mesh = create_mesh()
    sampler = make_bulk_sampler(process, mesh, batch_size)

    rng = jax.random.PRNGKey(0)
    out = sampler(params, rng)           # compile + warmup
    jax.block_until_ready(out)
    start = time.perf_counter()
    out = sampler(params, jax.random.fold_in(rng, 1))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return batch_size / elapsed, len(jax.devices())


def emit(batch_size: int):
    imgs_per_sec, n_chips = run(batch_size)
    value = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "dDDPM_x2_256px_sampling_imgs_per_sec_per_chip",
        "value": round(value, 4),
        "unit": f"imgs/sec/chip (1000-step reverse chain, bs {batch_size}, "
                "bf16, fused attention)",
        "vs_baseline": round(value / REFERENCE_IMGS_PER_SEC, 4),
    }))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        emit(int(sys.argv[2]))
        return

    batch_size = int(os.environ.get("BENCH_BATCH", "96"))
    while batch_size >= 8:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run",
             str(batch_size)],
            capture_output=True, text=True, timeout=3000)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        print(f"# batch {batch_size} failed, retrying at {batch_size // 2}",
              file=sys.stderr)
        batch_size //= 2
    raise RuntimeError("could not run benchmark even at batch 8")


if __name__ == "__main__":
    main()
