"""Merge multi-run loss-curve parity JSONs into one N-seed statement.

compare_loss_curves.py writes per-seed curves; runs for different seed
sets land in different files (the torch CPU side costs ~27 min per
1k-step seed, so seeds are accumulated across sessions).  This script
pools all seeds, reports the cross-framework window-ratio curve of the
pooled means, and calibrates it against ALL same-framework seed-pair
bands (the natural noise floor).

    python scripts/merge_loss_parity.py results/loss_curve_parity_1k.json \
        results/loss_curve_parity_1k_s23.json \
        --out results/loss_curve_parity_1k_4seed.json
"""
import argparse
import itertools
import json

import numpy as np


def window_ratios(a, b, window=50):
    out = []
    for i in range(0, len(a) - window + 1, window):
        out.append(float(np.mean(a[i:i + window]) /
                         np.mean(b[i:i + window])))
    return out


def pair_band(curves, window):
    """Per-window min/max ratio over all ordered seed pairs."""
    ratios = [window_ratios(a, b, window)
              for a, b in itertools.permutations(curves, 2)]
    arr = np.asarray(ratios)
    return arr.min(axis=0).tolist(), arr.max(axis=0).tolist()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--out", default="results/loss_curve_parity_1k_4seed.json")
    args = p.parse_args()

    tcs, jcs, t_seeds, j_seeds = [], [], [], []
    steps = None
    for f in args.files:
        with open(f) as fh:
            d = json.load(fh)
        assert steps is None or steps == d["steps"], "mixed step counts"
        steps = d["steps"]
        tcs += d["torch_curves"]
        jcs += d["jax_curves"]
        t_seeds += d.get("torch_seeds", d["seeds"])
        j_seeds += d["seeds"]

    tc = np.mean(tcs, axis=0)
    jc = np.mean(jcs, axis=0)
    ratios = window_ratios(jc, tc, args.window)
    t_lo, t_hi = pair_band(tcs, args.window)
    j_lo, j_hi = pair_band(jcs, args.window)

    # the pooled cross-framework ratio vs the same-framework band:
    # windows where the torch seed-pair band already contains the
    # cross-framework ratio are indistinguishable from seed luck
    inside = [t_lo[i] <= ratios[i] <= t_hi[i] for i in range(len(ratios))]
    result = {
        "steps": steps, "window": args.window,
        "torch_seeds": t_seeds, "jax_seeds": j_seeds,
        "window_ratios_jax_over_torch_pooled": ratios,
        "torch_seed_pair_band": [t_lo, t_hi],
        "jax_seed_pair_band": [j_lo, j_hi],
        "windows_inside_torch_noise_band": inside,
        "frac_inside": float(np.mean(inside)),
        "final_window_ratio": ratios[-1],
        "loss_drop_torch": float(tc[0] / np.mean(tc[-args.window:])),
        "loss_drop_jax": float(jc[0] / np.mean(jc[-args.window:])),
        "source_files": args.files,
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"pooled {len(tcs)} torch + {len(jcs)} jax seeds, {steps} steps")
    print("jax/torch pooled window ratios:",
          [f"{r:.3f}" for r in ratios])
    print("torch seed-pair band: ",
          [f"{a:.2f}-{b:.2f}" for a, b in zip(t_lo, t_hi)])
    print("jax seed-pair band:   ",
          [f"{a:.2f}-{b:.2f}" for a, b in zip(j_lo, j_hi)])
    print(f"{100 * result['frac_inside']:.0f}% of windows inside the "
          f"torch cross-seed band; final ratio {ratios[-1]:.3f}; "
          f"loss drop torch {result['loss_drop_torch']:.1f}x "
          f"jax {result['loss_drop_jax']:.1f}x")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
