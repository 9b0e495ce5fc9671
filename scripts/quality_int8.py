"""Sample-quality comparison of the int8 serving mode vs bf16.

Trains the quality-smoke config (synthetic 32², T=1000) for a few
thousand steps on the default backend, then bulk-samples the SAME
checkpoint twice — once in bf16, once with --quant-conv int8
(trajectory-calibrated activation scales) and the same seed/noise
stream — and scores both sample sets against a fixed reference batch
of the training distribution with the same (random-init) Inception
extractor.  Because extractor, checkpoint, seed and reference batch
are all shared, the FID/precision/recall DELTAS isolate the effect of
int8 conv quantization; the script also reports direct pixel agreement
between the matched bf16/int8 samples.

    python scripts/quality_int8.py [--steps 2000] [--fid-samples 256]
        [--workdir /tmp/quality_int8] [--out results/quality_int8_tpu.json]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from quality_smoke import REPO, run, train_run  # noqa: E402


def sample(ws, ckpt, n, bs, quant=False):
    out = os.path.join(ws, "samples_int8" if quant else "samples_bf16")
    args = [os.path.join(REPO, "generate_model_samples.py"),
            "--checkpoint", ckpt, "--fid-samples", str(n),
            "--batch-size", str(bs), "--out", out,
            "--latent-out", out + "_latent", "--seed", "0"]
    if quant:
        args += ["--quant-conv", "int8", "--quant-calib", "trajectory"]
    run(args, cwd=ws, timeout=5400)
    return os.path.join(out, os.path.basename(ckpt) + ".npy")


def score(ws, ckpt, npy, ref_npy):
    out = run([os.path.join(REPO, "evaluate_ddpm.py"),
               "--checkpoint", ckpt, "--samples", npy,
               "--reference", ref_npy, "--skip-test-losses",
               "--allow-random-inception"], cwd=ws)
    return json.loads(out[out.index("{"):])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--fid-samples", type=int, default=256)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/quality_int8")
    p.add_argument("--out", default="results/quality_int8_tpu.json")
    args = p.parse_args()
    ws = args.workdir
    os.makedirs(ws, exist_ok=True)

    print(f"reference batch ({args.fid_samples} synthetic train images)",
          flush=True)
    run([os.path.join(REPO, "create_ref_batch.py"), "-d", "synthetic",
         "-is", "32", "--n", str(args.fid_samples), "--bs", "64",
         "--out", os.path.join(ws, "reference")], cwd=ws)
    ref_npy = os.path.join(ws, "reference",
                           f"synthetic_{args.fid_samples}.npy")

    print(f"training {args.steps} steps", flush=True)
    ckpt, _ = train_run(ws, args.steps)

    print("sampling bf16", flush=True)
    npy_b = sample(ws, ckpt, args.fid_samples, args.bs, quant=False)
    print("sampling int8 (same seed)", flush=True)
    npy_q = sample(ws, ckpt, args.fid_samples, args.bs, quant=True)

    print("scoring both", flush=True)
    m_b = score(ws, ckpt, npy_b, ref_npy)
    m_q = score(ws, ckpt, npy_q, ref_npy)

    xb = np.load(npy_b).astype(np.float32)
    xq = np.load(npy_q).astype(np.float32)
    pix = np.abs(xb - xq)
    result = {
        "config": {"dataset": "synthetic", "image_size": 32, "T": 1000,
                   "steps": args.steps, "fid_samples": args.fid_samples,
                   "seed_matched": True,
                   "inception": "random-init (shared extractor; deltas "
                                 "isolate quantization)"},
        "metrics_bf16": m_b,
        "metrics_int8": m_q,
        "fid_ratio_int8_over_bf16": m_q["fid"] / max(m_b["fid"], 1e-12),
        "pixel_mean_abs_delta_0_255": float(pix.mean()),
        "pixel_p99_abs_delta_0_255": float(np.percentile(pix, 99)),
        "pixel_max_abs_delta_0_255": float(pix.max()),
    }
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)),
                exist_ok=True)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
