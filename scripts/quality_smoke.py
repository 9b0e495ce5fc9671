"""Long-horizon sample-quality smoke on the real chip (VERDICT r4 item 8).

The reference's de-facto integration test is sample quality after real
training (/root/reference/evaluate_ddpm.py:79-106).  This script runs
that pipeline end-to-end on the default backend (the TPU under the
driver): train the same config twice — a near-init run and a
multi-thousand-step run — then sample each checkpoint in bulk and
score both sample sets against a fixed reference batch of the training
distribution.  The claim being tested is the TREND: FID(trained) must
be far below FID(near-init), and the train loss must keep dropping
past the 1k-step horizon of the loss-curve parity study.  Absolute
FID values use the random-init Inception (no weights in this image;
--allow-random-inception) and are only meaningful relative to each
other.

    python scripts/quality_smoke.py [--steps 3000] [--early 50]
        [--workdir /tmp/quality_smoke] [--out results/quality_smoke_tpu.json]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd, timeout=3600):
    env = dict(os.environ)
    # APPEND to PYTHONPATH, never clobber: the image loads the axon TPU
    # PJRT plugin via a sitecustomize on the inherited PYTHONPATH
    # (/root/.axon_site); overwriting it leaves JAX_PLATFORMS=axon
    # pointing at an unregistered backend and every jnp call raises
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    t0 = time.time()
    proc = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"{args} failed:\n{proc.stderr[-3000:]}")
    print(f"  $ {os.path.basename(args[0])} {' '.join(args[1:3])} ... "
          f"({time.time() - t0:.0f}s)", flush=True)
    return proc.stdout


def train_run(ws, steps, seed=0):
    d = os.path.join(ws, f"train_{steps}")
    os.makedirs(d, exist_ok=True)
    ckpt_root = os.path.join(d, "results/checkpoints")
    # resume support: a prior interrupted invocation may have finished
    # this training leg — reuse its checkpoint if the losses run to
    # the requested step count, so a relaunch only redoes what's missing
    if os.path.isdir(ckpt_root):
        for c in os.listdir(ckpt_root):
            lf = os.path.join(ckpt_root, c, "train_losses.json")
            if os.path.exists(lf) and len(json.load(open(lf))) >= steps:
                print(f"  (reusing completed train_{steps} checkpoint)")
                return os.path.join(ckpt_root, c), json.load(open(lf))
    run([os.path.join(REPO, "train.py"), "-d", "synthetic", "-e", str(steps),
         "-bs", "32", "-is", "32", "-mute", "--T", "1000",
         "--seed", str(seed)], cwd=d)
    ckpts = [os.path.join(ckpt_root, c) for c in os.listdir(ckpt_root)]
    assert len(ckpts) == 1, ckpts
    losses = json.load(open(os.path.join(ckpts[0], "train_losses.json")))
    return ckpts[0], losses


def sample_and_score(ws, ckpt, ref_npy, n=256, bs=64):
    tag = os.path.basename(os.path.dirname(os.path.dirname(
        os.path.dirname(ckpt)))) or "run"
    out = os.path.join(ws, f"samples_{tag}_{os.path.basename(ckpt)}")
    run([os.path.join(REPO, "generate_model_samples.py"),
         "--checkpoint", ckpt, "--fid-samples", str(n),
         "--batch-size", str(bs), "--out", out,
         "--latent-out", out + "_latent"], cwd=ws)
    npy = os.path.join(out, os.path.basename(ckpt) + ".npy")
    metrics_out = run([os.path.join(REPO, "evaluate_ddpm.py"),
                       "--checkpoint", ckpt, "--samples", npy,
                       "--reference", ref_npy, "--skip-test-losses",
                       "--allow-random-inception"], cwd=ws)
    return json.loads(metrics_out[metrics_out.index("{"):])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--early", type=int, default=50)
    p.add_argument("--fid-samples", type=int, default=256)
    p.add_argument("--workdir", default="/tmp/quality_smoke")
    p.add_argument("--out", default="results/quality_smoke_tpu.json")
    args = p.parse_args()
    ws = args.workdir
    os.makedirs(ws, exist_ok=True)

    print(f"reference batch ({args.fid_samples} synthetic train images)")
    run([os.path.join(REPO, "create_ref_batch.py"), "-d", "synthetic",
         "-is", "32", "--n", str(args.fid_samples), "--bs", "64",
         "--out", os.path.join(ws, "reference")], cwd=ws)
    ref_npy = os.path.join(ws, "reference",
                           f"synthetic_{args.fid_samples}.npy")

    print(f"training {args.early} steps (near-init)")
    ckpt_early, losses_early = train_run(ws, args.early)
    print(f"training {args.steps} steps")
    ckpt_late, losses_late = train_run(ws, args.steps)

    print("sampling + scoring near-init checkpoint")
    m_early = sample_and_score(ws, ckpt_early, ref_npy, args.fid_samples)
    print("sampling + scoring trained checkpoint")
    m_late = sample_and_score(ws, ckpt_late, ref_npy, args.fid_samples)

    k = max(1, args.early // 2)
    result = {
        "config": {"dataset": "synthetic", "image_size": 32, "T": 1000,
                   "batch_size": 32,
                   "steps_early": args.early, "steps_trained": args.steps,
                   "fid_samples": args.fid_samples,
                   "inception": "random-init (relative trend only)"},
        "loss_first_window": float(sum(losses_late[:k]) / k),
        "loss_at_1k": (float(sum(losses_late[950:1000]) / 50)
                       if args.steps >= 1000 else None),
        "loss_final_window": float(sum(losses_late[-50:]) / min(
            50, len(losses_late))),
        "metrics_early": m_early,
        "metrics_trained": m_late,
        "fid_early": m_early["fid"],
        "fid_trained": m_late["fid"],
        "fid_improvement": m_early["fid"] / max(m_late["fid"], 1e-9),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if not k.startswith("metrics")}, indent=2))
    assert result["fid_trained"] < 0.5 * result["fid_early"], (
        "trained FID did not improve at least 2x over near-init — "
        "sample quality is not tracking training")
    print(f"OK: FID {result['fid_early']:.2f} -> "
          f"{result['fid_trained']:.2f} "
          f"({result['fid_improvement']:.1f}x better); wrote {args.out}")


if __name__ == "__main__":
    main()
