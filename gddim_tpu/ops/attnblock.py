"""Fused spatial-attention block Pallas kernel (inference fast path).

Companion to ops/resblock.py: executes the whole AttnBlockpp
(reference layerspp.py:61-83)

    h = GroupNorm(x)
    q, k, v = NIN_0(h), NIN_1(h), NIN_2(h)
    a = softmax(q k^T / sqrt(C)) v
    out = x + NIN_3(a)        [* 1/sqrt(2) with skip_rescale]

per batch-tile in VMEM — x read once, out written once, the (S, S) score
matrix never touches HBM. At the NCSN++ attention resolutions (S <= 1024,
C <= 512) everything fits comfortably. Per-sample math is rank-2 (see
resblock.py on Mosaic rank-3 layouts). Inference-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.ops.groupnorm import _group_indicator

_INV_SQRT2 = 0.7071067811865476


def _gn_2d(x, pmat, scale, bias, inv_n, eps):
    s = jnp.sum(x, axis=0, keepdims=True)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    mean = jax.lax.dot(s, pmat, preferred_element_type=jnp.float32) * inv_n
    esq = jax.lax.dot(sq, pmat, preferred_element_type=jnp.float32) * inv_n
    var = esq - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _attnblock_kernel(
    x_ref, gns_ref, gnb_ref, p_ref, wq_ref, bq_ref, wk_ref, bk_ref,
    wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
    *, bt, n, c, inv_n, eps, rescale, mm_dtype,
):
    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    scale = c ** (-0.5)
    for s in range(bt):
        x = x_ref[s].astype(jnp.float32)  # (n, c)
        h = _gn_2d(x, p_ref[...], gns_ref[0], gnb_ref[0], inv_n, eps)
        q = mm(h, wq_ref[...]) + bq_ref[0]
        k = mm(h, wk_ref[...]) + bk_ref[0]
        v = mm(h, wv_ref[...]) + bv_ref[0]
        logits = jax.lax.dot_general(
            q.astype(mm_dtype), k.astype(mm_dtype),
            (((1,), (1,)), ((), ())),  # q @ k^T
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits - jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        a = mm(p, v)
        o = mm(a, wo_ref[...]) + bo_ref[0]
        out = x + o
        if rescale:
            out = out * _INV_SQRT2
        o_ref[s] = out.astype(o_ref.dtype)


def fused_attnblock(
    x, gn_scale, gn_bias, wq, bq, wk, bk, wv, bv, wo, bo,
    *, num_groups: int, eps: float = 1e-6, skip_rescale: bool = False,
    mm_dtype=jnp.bfloat16,
):
    """x: (B, H, W, C); NIN weights (C, C) with (C,) biases."""
    b, h, w_, c = x.shape
    n = h * w_
    bt = 1
    itemsize = jnp.dtype(x.dtype).itemsize
    for cand in (8, 4, 2, 1):
        need = (
            2 * 2 * cand * n * c * itemsize  # in/out blocks, double-buffered
            + 4 * c * c * 4 + c * c * 4  # weights + indicator
            + (3 * n * c + n * n + n * c) * 4  # q/k/v + scores + out (f32)
        )
        if b % cand == 0 and need <= 11 * 2**20:
            bt = cand
            break
    inv_n = 1.0 / (n * (c // num_groups))
    kernel = functools.partial(
        _attnblock_kernel, bt=bt, n=n, c=c, inv_n=inv_n, eps=eps,
        rescale=skip_rescale, mm_dtype=mm_dtype,
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    mat = lambda v: jnp.asarray(v, jnp.float32)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((1, c)), const((1, c)), const((c, c)),
            const((c, c)), const((1, c)),
            const((c, c)), const((1, c)),
            const((c, c)), const((1, c)),
            const((c, c)), const((1, c)),
        ],
        out_specs=pl.BlockSpec(
            (bt, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
    )(
        x.reshape(b, n, c),
        row(gn_scale), row(gn_bias), _group_indicator(c, num_groups),
        mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
    )
    return out.reshape(b, h, w_, c)


def attnblock_reference(
    x, gn_scale, gn_bias, wq, bq, wk, bk, wv, bv, wo, bo,
    *, num_groups: int, eps: float = 1e-6, skip_rescale: bool = False,
):
    """Unfused XLA composition (correctness oracle)."""
    from gddim_tpu.ops.attention import attention_xla
    from gddim_tpu.ops.groupnorm import group_norm_silu_reference

    b, h, w_, c = x.shape
    hn = group_norm_silu_reference(
        x, gn_scale, gn_bias, num_groups, eps, apply_silu=False
    )
    flat = hn.reshape(b, h * w_, c)
    q = flat @ jnp.asarray(wq, flat.dtype) + jnp.asarray(bq, flat.dtype)
    k = flat @ jnp.asarray(wk, flat.dtype) + jnp.asarray(bk, flat.dtype)
    v = flat @ jnp.asarray(wv, flat.dtype) + jnp.asarray(bv, flat.dtype)
    a = attention_xla(q, k, v)
    o = a @ jnp.asarray(wo, flat.dtype) + jnp.asarray(bo, flat.dtype)
    out = x + o.reshape(b, h, w_, c)
    if skip_rescale:
        out = out * _INV_SQRT2
    return out


def supported(x_shape) -> bool:
    b, h, w, c = x_shape
    n = h * w
    return (
        jax.default_backend() == "tpu"
        and c % 128 == 0
        and n % 128 == 0
        and (3 * n * c + n * n + n * c) * 4 + 5 * c * c * 4 < 8 * 2**20
    )
