"""Spatial self-attention core for the score U-Nets.

The reference computes softmax(q k^T / sqrt(C)) v over H*W tokens with a
5-D einsum that materializes (B, H, W, H, W) (cld_jax/models/layerspp.py:74-78).
Here the tokens are flattened to (B, S, C) so the contractions are plain MXU
matmuls; the Pallas implementation fuses the softmax(qk)v chain in VMEM to
avoid spilling the (B, S, S) score matrix to HBM.

Both implementations are numerically interchangeable; `impl='auto'` picks
Pallas on TPU for supported shapes and XLA elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def attention_xla(q, k, v):
    """(B, S, C) attention via two MXU matmuls + softmax, f32 accumulation."""
    c = q.shape[-1]
    scale = c ** (-0.5)
    logits = jnp.einsum(
        "bsc,btc->bst", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bst,btc->bsc", w, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


@jax.custom_vjp
def attention_pallas(q, k, v):
    """Fused attention kernel (lazy import keeps CPU paths Pallas-free).

    The Pallas kernel has no transpose rule; gradients recompute through the
    XLA attention (custom_vjp below), so the fused kernel is usable in
    training as well as sampling.
    """
    from gddim_tpu.ops.flash import flash_attention

    return flash_attention(q, k, v)


def _attention_pallas_fwd(q, k, v):
    return attention_pallas(q, k, v), (q, k, v)


def _attention_pallas_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_xla, q, k, v)
    return vjp(g)


attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def _pallas_supported(q) -> bool:
    if jax.default_backend() != "tpu":
        return False
    s, c = q.shape[-2], q.shape[-1]
    return s % 128 == 0 and c % 128 == 0


def attention_einsum5d(q, k, v):
    """Reference-shaped attention: bhwc,bHWc->bhwHW softmax einsum
    (cld_jax/models/layerspp.py:74-78). Kept as the measured x1-baseline
    implementation; materializes the (B, H, W, H, W) score tensor."""
    b, h, w, c = q.shape
    logits = jnp.einsum("bhwc,bHWc->bhwHW", q, k) * (int(c) ** (-0.5))
    logits = logits.reshape(b, h, w, h * w)
    weights = jax.nn.softmax(logits, axis=-1).reshape(b, h, w, h, w)
    return jnp.einsum("bhwHW,bHWc->bhwc", weights, v)


def self_attention_2d(q, k, v, impl: str = "auto"):
    """Attention over spatial tokens; q/k/v are (B, H, W, C)."""
    b, h, w, c = q.shape
    if impl == "einsum5d":
        return attention_einsum5d(q, k, v)
    qf, kf, vf = (x.reshape(b, h * w, c) for x in (q, k, v))
    if impl == "auto":
        impl = "pallas" if _pallas_supported(qf) else "xla"
    if impl == "pallas":
        out = attention_pallas(qf, kf, vf)
    elif impl == "xla":
        out = attention_xla(qf, kf, vf)
    else:
        raise ValueError(f"unknown attention impl {impl}")
    return out.reshape(b, h, w, c)
