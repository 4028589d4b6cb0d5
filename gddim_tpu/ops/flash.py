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


def _attn_kernel_blocked(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                         *, scale: float):
    """Online-softmax recurrence over k/v blocks (grid = (B, S/bq, S/bk)).

    The k-block index is the innermost grid dimension, so the (m, l, acc)
    VMEM scratch carries the running max / normalizer / weighted sum across
    k blocks for one (batch, q-block) pair.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (bq, bk) f32
    m_prev = m_ref[...]  # (bq, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


_MAX_SINGLE_BLOCK = 1024


def flash_attention(q, k, v, block_q: int = 512, block_k: int = 512):
    """(B, S, C) single-head attention, fused in VMEM. S, C multiples of 128.

    S <= 1024 runs the whole sequence in one VMEM tile; longer sequences use
    the blocked online-softmax recurrence (flash attention proper).
    """
    b, s, c = q.shape
    assert k.shape == v.shape == (b, s, c)
    scale = float(c) ** -0.5
    if s <= _MAX_SINGLE_BLOCK:
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

    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)
    nq, nk = s // block_q, s // block_k
    kernel = functools.partial(_attn_kernel_blocked, scale=scale)
    q_spec = pl.BlockSpec(
        (1, block_q, c), lambda i, jq, jk: (i, jq, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, block_k, c), lambda i, jq, jk: (i, jk, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (1, block_q, c), lambda i, jq, jk: (i, jq, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, c), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running normalizer
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * c,
            bytes_accessed=4 * b * s * c * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(q, k, v)
