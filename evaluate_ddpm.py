"""Evaluate a trained model: VLB + L_simple on the test set and
FID/sFID/IS/precision/recall of saved samples vs a reference batch.

Reference evaluate_ddpm.py: loads checkpoint + samples npy + reference
npy, prints a metrics JSON.

    python evaluate_ddpm.py --checkpoint <dir> --samples <npy> \
        --reference <npy> [--data-root ../data/] [--inception-weights npz]
"""
import argparse
import json

import numpy as np
import jax

from dddpm_tpu.data.pipeline import get_dataloader
from dddpm_tpu.evaluation.evaluator import Evaluator, require_inception_optin
from dddpm_tpu.evaluation.helpers import compute_test_losses
from dddpm_tpu.models.factory import build_model
from dddpm_tpu.train import checkpoint as ckpt
from dddpm_tpu.train.state import create_optimizer, create_train_state


from dddpm_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--samples", required=True, help="samples npy path")
    p.add_argument("--reference", required=True, help="reference batch npy")
    p.add_argument("--data-root", default="../data/", dest="data_root")
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--test-batches", type=int, default=None,
                   help="cap test-loss batches (full T-step VLB is slow)")
    p.add_argument("--skip-test-losses", action="store_true")
    p.add_argument("--prec-recall-subset", type=int, default=None,
                   help="subsample the P/R manifold estimate to N features "
                        "(default: full set, matching the reference)")
    p.add_argument("--allow-random-inception", action="store_true",
                   help="compute FID/IS/P/R through a random-init Inception "
                        "(machinery check only; numbers are NOT comparable)")
    args = p.parse_args()
    require_inception_optin(args.inception_weights,
                            args.allow_random_inception, "evaluate_ddpm")

    config = ckpt.load_config(args.checkpoint)
    if "unet_dims" in config:
        config["unet_dims"] = tuple(config["unet_dims"])

    metrics = {}

    if not args.skip_test_losses:
        net, process, init_fn, config = build_model(config)
        tx = create_optimizer(config["lr"])
        abstract = jax.eval_shape(
            lambda r: create_train_state(config, init_fn, r, tx),
            jax.random.PRNGKey(0))
        state = ckpt.restore_checkpoint(args.checkpoint, abstract)
        params = (state.ema_params if config.get("ema_decay", 0) > 0
                  else state.params)
        test_loader = get_dataloader(config, False, args.data_root)
        vlb, l_simple = compute_test_losses(
            process, params, jax.random.PRNGKey(0), test_loader,
            args.test_batches)
        metrics["vlb"] = vlb
        metrics["L_simple"] = l_simple

    # paths stream in bounded memory (npy mmap / npz chunked decompress);
    # 50k 256^2 sample files are ~10GB.  On a multi-device slice the
    # Inception activation pass batch-shards over a 1-D data mesh.
    from dddpm_tpu.parallel.mesh import create_mesh
    mesh = create_mesh() if len(jax.devices()) > 1 else None
    evaluator = Evaluator(args.inception_weights, mesh=mesh)
    metrics.update(evaluator.evaluate(
        args.reference, args.samples,
        prec_recall_subset=args.prec_recall_subset))

    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
