"""CLI integration tests: every entry script exercised end-to-end via
subprocess on tiny configs (CPU backend forced through DDDPM_PLATFORM).

This is the pipeline a reference user runs: train -> resume ->
generate samples -> create ref batch -> evaluate -> compare.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess e2e pipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(args, cwd, extra_env=None, timeout=1200):
    env = dict(os.environ)
    env["DDDPM_PLATFORM"] = "cpu"
    # append, never clobber: the axon TPU plugin loads via a
    # sitecustomize on the inherited PYTHONPATH (/root/.axon_site)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{args} failed:\nSTDOUT:{proc.stdout[-2000:]}\n"
        f"STDERR:{proc.stderr[-2000:]}")
    return proc.stdout


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Train a tiny model once; downstream scripts reuse the artifacts."""
    ws = tmp_path_factory.mktemp("cli")
    out = run_script(
        [os.path.join(REPO, "train.py"), "-d", "synthetic", "-e", "3",
         "-bs", "8", "-is", "8", "-mute", "--compute-dtype", "float32",
         "--T", "100"],
        cwd=str(ws))
    assert "train.py script finished!" in out
    ckpts = list((ws / "results" / "checkpoints").iterdir())
    assert len(ckpts) == 1
    return ws, str(ckpts[0])


def test_train_writes_checkpoint_and_config(workspace):
    ws, ckpt = workspace
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model"] == "ddpm"
    assert cfg["n_steps"] == 3
    assert "model_size" in cfg
    losses = json.load(open(os.path.join(ckpt, "train_losses.json")))
    assert len(losses) == 3


def test_resume_from_checkpoint(workspace):
    ws, ckpt = workspace
    out = run_script(
        [os.path.join(REPO, "train_from_checkpoint.py"),
         "--checkpoint", ckpt, "--steps", "5", "-mute"],
        cwd=str(ws))
    assert "Resuming ddpm at step 3" in out


def test_generate_and_evaluate_pipeline(workspace):
    ws, ckpt = workspace

    # bulk sampling
    out = run_script(
        [os.path.join(REPO, "generate_model_samples.py"),
         "--checkpoint", ckpt, "--fid-samples", "16", "--batch-size", "8",
         "--out", "samples", "--latent-out", "samples_latent"],
        cwd=str(ws))
    assert "Total time:" in out and "Samples saved" in out
    name = os.path.basename(ckpt)
    samples = np.load(str(ws / "samples" / f"{name}.npy"))
    assert samples.shape == (2, 8, 8, 8, 3)
    assert samples.min() >= 0 and samples.max() <= 255

    # reference batch
    run_script(
        [os.path.join(REPO, "create_ref_batch.py"), "-d", "synthetic",
         "-is", "8", "--n", "16", "--bs", "8", "--out", "reference"],
        cwd=str(ws))
    ref = np.load(str(ws / "reference" / "synthetic_16.npy"))
    assert ref.shape == (2, 8, 8, 8, 3)

    # without real Inception weights the evaluators must REFUSE to
    # print metrics unless the random-init extractor is opted into
    # (the reference always evaluates through real downloaded weights)
    env = dict(os.environ, DDDPM_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("INCEPTION_WEIGHTS_NPZ", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "evaluate_ddpm.py"),
         "--checkpoint", ckpt,
         "--samples", str(ws / "samples" / f"{name}.npy"),
         "--reference", str(ws / "reference" / "synthetic_16.npy"),
         "--skip-test-losses"],
        cwd=str(ws), env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "--allow-random-inception" in proc.stderr
    assert "fid" not in proc.stdout

    # evaluation (skip the slow full-chain VLB; FID machinery exercised)
    out = run_script(
        [os.path.join(REPO, "evaluate_ddpm.py"), "--checkpoint", ckpt,
         "--samples", str(ws / "samples" / f"{name}.npy"),
         "--reference", str(ws / "reference" / "synthetic_16.npy"),
         "--skip-test-losses", "--allow-random-inception"],
        cwd=str(ws))
    metrics = json.loads(out[out.index("{"):])
    for key in ("is", "fid", "sfid", "precision", "recall"):
        assert key in metrics
    assert metrics["inception_weights"] == "random-init"

    # dataset-vs-dataset comparison
    out = run_script(
        [os.path.join(REPO, "compare_datasets.py"),
         "--batch1", str(ws / "reference" / "synthetic_16.npy"),
         "--batch2", str(ws / "reference" / "synthetic_16.npy"),
         "--allow-random-inception"],
        cwd=str(ws))
    metrics = json.loads(out[out.index("{"):])
    assert abs(metrics["fid"]) < 1e-3  # identical batches -> FID 0
    assert metrics["precision"] == 1.0 and metrics["recall"] == 1.0
