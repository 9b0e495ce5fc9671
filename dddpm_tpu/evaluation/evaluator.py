"""The end-to-end sample evaluator: FID, sFID, IS, precision, recall.

TPU-native replacement for the reference's TF1 Evaluator
(utils/evaluator.py:85-156): activations come from the flax InceptionV3
(jitted, batched), statistics/Frechet stay host-side float64, precision/
recall run as jitted pairwise-distance tiles.  Accepts the reference's
npy artifact format: (n_batches, B, H, W, C) or (N, H, W, C), values in
[0, 255].
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dddpm_tpu.evaluation.fid import (
    FIDStatistics,
    compute_inception_score,
)
from dddpm_tpu.evaluation.inception import FeatureExtractor
from dddpm_tpu.evaluation.prec_recall import compute_prec_recall


def require_inception_optin(weights_npz: Optional[str], allow_random: bool,
                            prog: str) -> None:
    """Refuse to produce metrics from a random-init Inception unless the
    caller opted in explicitly.

    The reference always evaluates through the real downloaded OpenAI
    frozen graph (reference evaluate_ddpm.py:84-106); in this image the
    weights must be supplied as an npz (scripts/setup_real_inception.py).
    Without them the extractor is deterministic-random-init — the metric
    MACHINERY is exact but the absolute numbers are meaningless, so a
    bare CLI run must not print something a user could mistake for real
    FID.  Called before any model construction, so refusal is instant.
    """
    import os
    import sys

    if weights_npz or os.environ.get("INCEPTION_WEIGHTS_NPZ"):
        return
    if allow_random:
        return
    sys.exit(
        f"{prog}: no real InceptionV3 weights available — refusing to "
        "print FID/sFID/IS/precision/recall from a random-init extractor "
        "(the numbers would not be comparable to anything). Pass "
        "--inception-weights <npz> (export one with "
        "scripts/setup_real_inception.py) or set INCEPTION_WEIGHTS_NPZ; "
        "to exercise the metric machinery anyway, opt in with "
        "--allow-random-inception.")


def flatten_batches(arr: np.ndarray) -> np.ndarray:
    """(n_batches, B, H, W, C) -> (N, H, W, C); passthrough for 4-D."""
    arr = np.asarray(arr)
    if arr.ndim == 5:
        arr = arr.reshape(-1, *arr.shape[2:])
    assert arr.ndim == 4, f"expected image batch array, got {arr.shape}"
    return arr


class Evaluator:
    """Computes all sample-quality metrics against a reference batch."""

    def __init__(self, weights_npz: Optional[str] = None, batch_size: int = 64,
                 mesh=None):
        """mesh: optional 1-D 'data' device mesh — shards the Inception
        activation pass across the slice (params replicated); the
        statistics / Frechet / IS math downstream is unchanged."""
        self.extractor = FeatureExtractor(weights_npz, batch_size, mesh=mesh)

    def read_activations(self, images) -> Dict[str, np.ndarray]:
        """images: array, or .npy/.npz path (streamed in bounded memory)."""
        import os

        if isinstance(images, (str, os.PathLike)):
            return self.extractor(images)
        return self.extractor(flatten_batches(images))

    def compute_statistics(self, acts: Dict[str, np.ndarray]):
        return (FIDStatistics.from_activations(acts["pool3"]),
                FIDStatistics.from_activations(acts["spatial"]))

    def evaluate(self, reference: np.ndarray, samples: np.ndarray,
                 prec_recall_subset: Optional[int] = None) -> Dict[str, float]:
        """prec_recall_subset: None (default) runs the manifold estimate
        on the FULL feature sets, matching the reference's
        ManifoldEstimator (utils/evaluator.py:159-383) — the tiled
        kernel streams row/col blocks so 50k x 50k stays within host
        memory.  Pass an int to subsample explicitly (faster, but the
        published P/R numbers are then not reference-comparable)."""
        ref_acts = self.read_activations(reference)
        sample_acts = self.read_activations(samples)

        ref_stats, ref_stats_spatial = self.compute_statistics(ref_acts)
        stats, stats_spatial = self.compute_statistics(sample_acts)

        is_score = compute_inception_score(sample_acts["softmax"])
        fid = stats.frechet_distance(ref_stats)
        sfid = stats_spatial.frechet_distance(ref_stats_spatial)
        prec, recall = compute_prec_recall(
            ref_acts["pool3"][:prec_recall_subset],
            sample_acts["pool3"][:prec_recall_subset])
        return {
            "is": is_score,
            "fid": fid,
            "sfid": sfid,
            "precision": prec,
            "recall": recall,
            "inception_weights": ("real" if self.extractor.has_real_weights
                                  else "random-init"),
        }
