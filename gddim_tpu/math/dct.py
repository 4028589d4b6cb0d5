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

# "matmul" (default): constant-matrix DCT on the MXU.
# "fft": reference-style lax.fft path (blur_jax/blur.py:11-97) — kept as the
# faithful x1-baseline implementation for benchmarking, not for production.
DCT_IMPL = "matmul"


def _dct1d_fft(x, axis: int):
    """Orthonormal DCT-II along `axis` via FFT (Makhoul even-odd permutation
    + twiddle — the reference's construction, blur_jax/blur.py:11-37)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    V = jnp.fft.fft(v)
    k = jnp.arange(n)
    tw = jnp.exp(-1j * jnp.pi * k / (2 * n))
    y = jnp.real(V * tw) * np.sqrt(2.0 / n)
    y = y.at[..., 0].multiply(np.sqrt(0.5))
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


def _idct1d_fft(y, axis: int):
    """Orthonormal DCT-III (inverse of _dct1d_fft) along `axis`."""
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    yy = y / np.sqrt(2.0 / n)
    yy = yy.at[..., 0].multiply(np.sqrt(2.0))
    k = jnp.arange(n)
    tw = jnp.exp(1j * jnp.pi * k / (2 * n))
    # mirror term: Y[n-k] with Y[0] mirror set to 0
    y_rev = jnp.concatenate(
        [jnp.zeros_like(yy[..., :1]), yy[..., 1:][..., ::-1]], axis=-1
    )
    V = (yy - 1j * y_rev) * tw
    v = jnp.real(jnp.fft.ifft(V))
    out = jnp.zeros_like(v)
    half = (n + 1) // 2
    out = out.at[..., ::2].set(v[..., :half])
    out = out.at[..., 1::2].set(v[..., half:][..., ::-1])
    return jnp.moveaxis(out.astype(y.dtype), -1, axis)


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
    if DCT_IMPL == "fft":
        return _dct1d_fft(_dct1d_fft(x, h_ax), w_ax)
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
    if DCT_IMPL == "fft":
        return _idct1d_fft(_idct1d_fft(y, w_ax), h_ax)
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
