"""Orthonormal 2-D DCT-II / iDCT via constant matmuls.

The reference builds the DCT from FFTs with even-odd permutations and twiddle
factors (blur_jax/blur.py:11-97) — the right trick for CUDA, the wrong one for
TPU, where `lax.fft` bypasses the MXU entirely. For the 32x32 (up to 256x256)
images this framework targets, the DCT is two matmuls with a constant NxN
orthonormal DCT matrix: `Y = D X D^T` per channel. That runs on the MXU, fuses
with neighbors, and is exact (no twiddle rounding).

The reference's normalization (blur.py:27-35) is exactly the orthonormal
("ortho") DCT-II/DCT-III pair, verified against scipy in tests/test_dct.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D with (D x)[k] = dct(x, norm='ortho')[k]."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d.astype(np.float64)


def dct2(x, axes=(1, 2)):
    """2-D orthonormal DCT-II over `axes` of an NHWC batch (default H, W)."""
    h_ax, w_ax = axes
    n_h, n_w = x.shape[h_ax], x.shape[w_ax]
    d_h = jnp.asarray(dct_matrix(n_h), dtype=x.dtype)
    d_w = jnp.asarray(dct_matrix(n_w), dtype=x.dtype)
    x = jnp.tensordot(d_h, x, axes=[[1], [h_ax]], precision=_HI)  # (H', ...) H-transform
    x = jnp.moveaxis(x, 0, h_ax)
    x = jnp.tensordot(d_w, x, axes=[[1], [w_ax]], precision=_HI)
    return jnp.moveaxis(x, 0, w_ax)


def idct2(y, axes=(1, 2)):
    """2-D orthonormal DCT-III (inverse of dct2)."""
    h_ax, w_ax = axes
    n_h, n_w = y.shape[h_ax], y.shape[w_ax]
    d_h = jnp.asarray(dct_matrix(n_h).T, dtype=y.dtype)
    d_w = jnp.asarray(dct_matrix(n_w).T, dtype=y.dtype)
    y = jnp.tensordot(d_h, y, axes=[[1], [h_ax]], precision=_HI)
    y = jnp.moveaxis(y, 0, h_ax)
    y = jnp.tensordot(d_w, y, axes=[[1], [w_ax]], precision=_HI)
    return jnp.moveaxis(y, 0, w_ax)


def batch_img_dct(xs):
    """NHWC batch -> DCT space (parity: blur_jax/blur.py:99-102)."""
    return dct2(xs, axes=(1, 2))


def batch_img_idct(ys):
    """DCT space -> NHWC batch (parity: blur_jax/blur.py:104-107)."""
    return idct2(ys, axes=(1, 2))
