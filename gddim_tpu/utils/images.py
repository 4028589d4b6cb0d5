"""Image grid / point-set figure writers (parity: cld_jax/utils.py:58-108).

The reference's `save_image` used the removed `jax.ops.index_update`
(utils.py:100-102, a known breakage); this is a plain numpy reimplementation.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """(N, H, W, C) in [0,1] -> (H', W', C) grid."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = math.ceil(n / ncol)
    grid = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value,
        dtype=np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def save_image(images: np.ndarray, path: str | Path, nrow: int = 8):
    from PIL import Image

    grid = make_grid(np.clip(images, 0.0, 1.0), nrow=nrow)
    arr = (grid * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def save_pointset(points: np.ndarray, path: str | Path):
    """Scatter the 2-D point set into a rasterized image (no matplotlib dep)."""
    pts = np.asarray(points)
    size = 256
    img = np.zeros((size, size), dtype=np.float32)
    lo, hi = pts.min(axis=0) - 0.5, pts.max(axis=0) + 0.5
    xy = ((pts - lo) / (hi - lo + 1e-9) * (size - 1)).astype(int)
    img[size - 1 - xy[:, 1], xy[:, 0]] = 1.0
    save_image(img[None, :, :, None], path, nrow=1)
