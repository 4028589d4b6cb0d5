"""Synthetic 2-D point-set data (reference: cld_jax/datasets.py:214-252)."""

from __future__ import annotations

import numpy as np


def circle_generate_sample(n: int, noise: float = 0.25, rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    angle = rng.uniform(high=2 * np.pi, size=n)
    random_noise = rng.normal(scale=np.sqrt(0.2), size=(n, 2))
    pos = np.stack([np.cos(angle), np.sin(angle)]).T
    return pos + noise * random_noise


def olympic_generate_sample(n: int, noise: float = 0.25, rng=None) -> np.ndarray:
    """Five-rings point cloud (reference :223-230)."""
    rng = rng or np.random.default_rng()
    w, h = 3.5, 1.5
    centers = np.array(
        [[-w, h], [0.0, h], [w, h], [-w * 0.6, -h], [w * 0.6, -h]]
    )
    pos = [
        circle_generate_sample(n // 5, noise, rng) + centers[i : i + 1] / 2
        for i in range(5)
    ]
    return np.concatenate(pos)
