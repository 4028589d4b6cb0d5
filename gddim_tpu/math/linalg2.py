"""Batched 2x2 linear algebra on the trailing two axes.

The CLD forward SDE couples each scalar pixel dimension with a velocity channel
through 2x2 matrices (reference: cld_jax/sde_lib.py:17-30, cld_jax/utils.py:179-185).
All ops here are shape-polymorphic over leading axes and work in both numpy and
jax.numpy (pass the namespace explicitly where it matters; default jnp).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

# 2x2 coefficient applications are tiny contractions (K=2); run them at full
# f32 precision — the default matmul precision downcasts noticeably (~1e-2
# relative) which would corrupt the sampler's coefficient math for free speed
# nobody needs on a K=2 dot.
_HI = lax.Precision.HIGHEST


def inv2(m):
    """Inverse of (..., 2, 2) matrices."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    xp = jnp if isinstance(m, jnp.ndarray) else np
    out = xp.stack(
        [xp.stack([d, -b], axis=-1), xp.stack([-c, a], axis=-1)], axis=-2
    )
    return out / det[..., None, None]


def mat2(a00, a01, a10, a11, xp=np):
    """Assemble (..., 2, 2) from four broadcastable components."""
    return xp.stack(
        [xp.stack([a00, a01], axis=-1), xp.stack([a10, a11], axis=-1)], axis=-2
    )


def bmm(mats, state):
    """Apply per-batch 2x2 matrices to trailing-dim-2 states.

    mats: (B, 2, 2); state: (B, ..., 2)  ->  (B, ..., 2)
    (parity with cld_jax/utils.py:179-181 `bmm`).
    """
    return jnp.einsum("bij,b...j->b...i", mats, state, precision=_HI)


def sbmm(mat, state):
    """Apply a single 2x2 matrix to trailing-dim-2 states.

    mat: (2, 2); state: (..., 2)  ->  (..., 2)
    (parity with cld_jax/utils.py:183-185 `sbmm`).
    """
    return jnp.einsum("ij,...j->...i", mat, state, precision=_HI)


def transpose2(m):
    return m.swapaxes(-1, -2)


def psd_sqrt_factor(cov: np.ndarray) -> np.ndarray:
    """Symmetric PSD factor A with A @ A.T = cov, for (..., 2, 2) covariances.

    Used on the host to pre-factor per-step noise covariances so stochastic
    samplers draw correlated noise via one matmul instead of
    `random.multivariate_normal(method="svd")` per step
    (reference: cld_jax/sampling.py:400,567). Computed by eigendecomposition
    with negative eigenvalues clipped to zero (covariances can be ~0 at the
    final step; reference zeroes it explicitly, sampling.py:421).
    """
    cov = np.asarray(cov, dtype=np.float64)
    w, v = np.linalg.eigh(cov)
    w = np.clip(w, 0.0, None)
    return np.einsum("...ij,...j,...kj->...ik", v, np.sqrt(w), v)
