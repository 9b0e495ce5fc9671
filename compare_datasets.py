"""FID/sFID/precision/recall between two saved npy image batches
(reference compare_datasets.py — the real-vs-real FID sanity check).

    python compare_datasets.py --batch1 a.npy --batch2 b.npy \
        [--inception-weights npz]
"""
import argparse
import json

import numpy as np

from dddpm_tpu.evaluation.evaluator import Evaluator, require_inception_optin


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch1", required=True)
    p.add_argument("--batch2", required=True)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--prec-recall-subset", type=int, default=None,
                   help="subsample the P/R manifold estimate to N features "
                        "(default: full set, matching the reference)")
    p.add_argument("--allow-random-inception", action="store_true",
                   help="compute FID/IS/P/R through a random-init Inception "
                        "(machinery check only; numbers are NOT comparable)")
    args = p.parse_args()
    require_inception_optin(args.inception_weights,
                            args.allow_random_inception, "compare_datasets")

    b1 = np.load(args.batch1, mmap_mode="r")
    b2 = np.load(args.batch2, mmap_mode="r")
    import jax

    from dddpm_tpu.parallel.mesh import create_mesh
    mesh = create_mesh() if len(jax.devices()) > 1 else None
    evaluator = Evaluator(args.inception_weights, mesh=mesh)
    metrics = evaluator.evaluate(b1, b2,
                                 prec_recall_subset=args.prec_recall_subset)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
