"""Frechet distance statistics (FID / sFID).

Same math as the reference's FIDStatistics (utils/evaluator.py:34-82):
mu/sigma over activation batches, Frechet distance via scipy sqrtm with
the eps-offset fallback for singular products.  sqrtm stays a host-side
float64 op by design — it is O(d^3) LAPACK work, not TPU work.
"""
from __future__ import annotations

import warnings
from typing import Optional

import numpy as np
from scipy import linalg


class FIDStatistics:
    """Gaussian fit (mu, sigma) to a set of activations."""

    def __init__(self, mu: np.ndarray, sigma: np.ndarray):
        self.mu = mu
        self.sigma = sigma

    @classmethod
    def from_activations(cls, acts: np.ndarray) -> "FIDStatistics":
        assert acts.ndim == 2, f"expected (N, D) activations, got {acts.shape}"
        mu = np.mean(acts, axis=0)
        sigma = np.cov(acts, rowvar=False)
        return cls(mu, sigma)

    def frechet_distance(self, other: "FIDStatistics", eps: float = 1e-6) -> float:
        """d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
        mu1, sigma1 = self.mu, self.sigma
        mu2, sigma2 = other.mu, other.sigma
        mu1 = np.atleast_1d(mu1)
        mu2 = np.atleast_1d(mu2)
        sigma1 = np.atleast_2d(sigma1)
        sigma2 = np.atleast_2d(sigma2)
        assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

        diff = mu1 - mu2
        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            # Same eps-on-diagonal fallback as the canonical TTUR/OpenAI
            # FID implementation the reference vendors (evaluator.py:60-66)
            warnings.warn(
                f"covariance product is singular; retrying sqrtm with {eps} "
                "added to the diagonal of both covariance estimates")
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                m = np.max(np.abs(covmean.imag))
                raise ValueError(f"Imaginary component {m}")
            covmean = covmean.real

        tr_covmean = np.trace(covmean)
        return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                     - 2 * tr_covmean)


def compute_fid(acts1: np.ndarray, acts2: np.ndarray) -> float:
    return FIDStatistics.from_activations(acts1).frechet_distance(
        FIDStatistics.from_activations(acts2))


def compute_inception_score(softmax_out: np.ndarray,
                            split_size: int = 5000) -> float:
    """Split-KL inception score (reference evaluator.py:133-146)."""
    softmax_out = np.asarray(softmax_out)
    scores = []
    for i in range(0, len(softmax_out), split_size):
        part = softmax_out[i:i + split_size]
        kl = part * (np.log(part) - np.log(np.expand_dims(np.mean(part, 0), 0)))
        kl = np.mean(np.sum(kl, 1))
        scores.append(np.exp(kl))
    return float(np.mean(scores))
