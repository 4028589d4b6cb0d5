"""FID / Inception Score math (JAX/numpy; extractor-agnostic).

Replaces the reference's tensorflow_gan dependency (cld_jax/evaluation.py,
run_lib.py:735-791) with a self-contained implementation:

- activation statistics (mu, sigma) over pooled features
- Frechet distance with an eigendecomposition-based sqrtm of
  sigma1 @ sigma2 (symmetric-stabilized), matching tfgan's
  trace(s1 + s2 - 2 sqrtm(s1 s2)) formula
- Inception Score from logits

Stats files use the reference's `assets/stats/*.npz` format with keys
`mu`/`sigma` (evaluation.py:45-60 loads `pool_3`-based stats the same way).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.linalg
import scipy.special


def activation_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    features = np.asarray(features, dtype=np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians, tfgan-compatible."""
    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def inception_score(logits: np.ndarray) -> float:
    """IS = exp(E_x KL(p(y|x) || p(y))) from (N, C) logits."""
    logits = np.asarray(logits, dtype=np.float64)
    logp = logits - scipy.special.logsumexp(logits, axis=1, keepdims=True)
    p = np.exp(logp)
    p_marg = p.mean(axis=0, keepdims=True)
    kl = (p * (logp - np.log(p_marg + 1e-16))).sum(axis=1)
    return float(np.exp(kl.mean()))


def load_dataset_stats(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Load (mu, sigma) from an npz stats file (reference evaluation.py:45-60)."""
    with np.load(path) as z:
        if "mu" in z:
            return z["mu"], z["sigma"]
        # tfgan-era files store raw pool_3 activations
        return activation_stats(z["pool_3"])


def save_dataset_stats(path: str | Path, mu: np.ndarray, sigma: np.ndarray):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, mu=mu, sigma=sigma)
