"""Weights-day-one runbook (VERDICT r3 item 7): one command that, given
the real OpenAI ``classify_image_graph_def.pb``
(/root/reference/utils/evaluator.py:526-536 downloads it from
``https://openaipublic.blob.core.windows.net/diffusion/jul-2021/ref_batches/classify_image_graph_def.pb``),

  1. exports the folded-BN npz via the tested TF graph walk
     (scripts/export_inception_weights.py),
  2. strict-loads it into the flax InceptionV3 — any topology/shape
     divergence from the real graph fails loudly here
     (tests/test_inception_tf.py::test_strict_loader_rejects_permuted_npz),
  3. runs a real-vs-real FID sanity: two disjoint halves of a synthetic
     (or user-provided) image set must give a small, finite FID and
     identical halves must give ~0,
  4. prints the export path + the env var to set.

    python scripts/setup_real_inception.py --pb classify_image_graph_def.pb \
        [--out results/inception_weights.npz] [--images ref_batch.npy]
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pb", required=True,
                   help="path to the real classify_image_graph_def.pb")
    p.add_argument("--out", default="results/inception_weights.npz")
    p.add_argument("--images", default=None,
                   help="optional npy image batch for the FID sanity; "
                        "synthetic images are used when omitted")
    args = p.parse_args()

    if not os.path.exists(args.pb):
        raise FileNotFoundError(args.pb)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    # 1. export (runs in a subprocess: TF and jax in one process fight
    # over threads on the single host core)
    print(f"[1/3] exporting {args.pb} -> {args.out}")
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "export_inception_weights.py"),
         "--pb", args.pb, "--out", args.out],
        check=True)

    # 2. strict load
    print("[2/3] strict-loading the npz into the flax model")
    from dddpm_tpu.evaluation.evaluator import Evaluator, flatten_batches

    evaluator = Evaluator(weights_npz=args.out, batch_size=32)
    assert evaluator.extractor.has_real_weights

    # 3. real-vs-real FID sanity
    print("[3/3] real-vs-real FID sanity")
    import numpy as np

    if args.images:
        imgs = flatten_batches(np.load(args.images, mmap_mode="r")[:256])
        imgs = np.asarray(imgs)
    else:
        from dddpm_tpu.data.datasets import make_synthetic
        imgs, _ = make_synthetic(64, 3, n=256, seed=0)
    half_a, half_b = imgs[: len(imgs) // 2], imgs[len(imgs) // 2:]
    disjoint = evaluator.evaluate(half_a, half_b)
    same = evaluator.evaluate(half_a, half_a)
    print(f"  disjoint-halves FID {disjoint['fid']:.4f} "
          f"(finite, > 0 expected)  identical FID {same['fid']:.2e}")
    assert np.isfinite(disjoint["fid"]) and disjoint["fid"] >= 0
    assert same["fid"] < 1e-3, "identical sets must give FID ~ 0"

    print("\nDone. Point the evaluator at the weights with either:")
    print(f"  export INCEPTION_WEIGHTS_NPZ={os.path.abspath(args.out)}")
    print(f"  python evaluate_ddpm.py ... --inception-weights {args.out}")


if __name__ == "__main__":
    main()
