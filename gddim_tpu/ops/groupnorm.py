"""Fused GroupNorm(+SiLU) Pallas kernel.

Every NCSN++ res-block runs GroupNorm -> SiLU -> conv twice
(reference layerspp.py:196-220); XLA computes the group statistics and the
normalize+activate as separate HBM passes. This kernel performs the whole
GroupNorm+SiLU in one VMEM pass per batch element: read x once, write the
activated output once. Statistics accumulate in f32.

Gradients fall back to XLA via jax.custom_vjp over the reference
implementation — sampling (the benchmarked path) uses the kernel, training
uses XLA both ways until the dedicated backward kernel lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_silu_reference(x, scale, bias, num_groups: int, eps: float = 1e-6,
                              apply_silu: bool = True):
    """XLA reference: f32 statistics, matches nn.GroupNorm + swish."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    norm = (xf - mean) * jax.lax.rsqrt(var + eps)
    norm = norm.reshape(x.shape)
    out = norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, pmat_ref, o_ref, *, inv_n,
                    eps, apply_silu):
    """Group statistics via one MXU matmul with the (C, C) same-group
    indicator matrix — the TPU vector unit cannot reshape the 128-wide lane
    dimension into (groups, c/groups), but summing channel moments through a
    0/1 matrix is a single 128x128 MXU pass and needs no reshape."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    p = pmat_ref[...]  # (C, C) group indicator
    s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    mean = jax.lax.dot(s, p, preferred_element_type=jnp.float32) * inv_n  # (1, C)
    esq = jax.lax.dot(sq, p, preferred_element_type=jnp.float32) * inv_n
    var = esq - mean * mean
    norm = (x - mean) * jax.lax.rsqrt(var + eps)
    out = norm * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _group_indicator(c: int, num_groups: int) -> jnp.ndarray:
    cg = c // num_groups
    groups = np.arange(c) // cg
    return jnp.asarray(
        (groups[:, None] == groups[None, :]).astype(np.float32)
    )


def _gn_silu_pallas(x, scale, bias, num_groups: int, eps: float,
                    apply_silu: bool):
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    inv_n = 1.0 / (h * w * (c // num_groups))
    kernel = functools.partial(
        _gn_silu_kernel, inv_n=inv_n, eps=eps, apply_silu=apply_silu
    )
    x_spec = pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[x_spec, p_spec, p_spec, m_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
    )(xf, scale.reshape(1, c), bias.reshape(1, c), _group_indicator(c, num_groups))
    return out.reshape(b, h, w, c)


def _gn_silu_quant_kernel(x_ref, scale_ref, bias_ref, pmat_ref, o_ref, s_ref,
                          *, inv_n, eps, apply_silu):
    """GroupNorm(+SiLU) fused with per-sample int8 quantization: the
    activated tensor never round-trips through HBM in bf16 — one int8 write
    plus a broadcast scale tile. Feeds conv3x3_pallas_int8 directly."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    p = pmat_ref[...]
    s = jnp.sum(x, axis=0, keepdims=True)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    mean = jax.lax.dot(s, p, preferred_element_type=jnp.float32) * inv_n
    esq = jax.lax.dot(sq, p, preferred_element_type=jnp.float32) * inv_n
    var = esq - mean * mean
    norm = (x - mean) * jax.lax.rsqrt(var + eps)
    out = norm * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    qs = jnp.maximum(jnp.max(jnp.abs(out)), 1e-12) / 127.0
    o_ref[0] = jnp.clip(jnp.round(out / qs), -127, 127).astype(jnp.int8)
    # (8, 128) broadcast tile per sample: the smallest output block the TPU
    # lowering accepts; the caller reads [:, 0, 0]
    s_ref[0] = jnp.full((8, 128), qs, jnp.float32)


def _gn_silu_quant_pallas(x, scale, bias, num_groups: int, eps: float,
                          apply_silu: bool):
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    inv_n = 1.0 / (h * w * (c // num_groups))
    kernel = functools.partial(
        _gn_silu_quant_kernel, inv_n=inv_n, eps=eps, apply_silu=apply_silu
    )
    x_spec = pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q, s_tile = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[x_spec, p_spec, p_spec, m_spec],
        out_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ],
    )(xf, scale.reshape(1, c), bias.reshape(1, c), _group_indicator(c, num_groups))
    return q.reshape(b, h, w, c), s_tile[:, 0, 0]


def group_norm_silu_quant(x, scale, bias, num_groups: int = 32,
                          eps: float = 1e-6, apply_silu: bool = True):
    """GroupNorm(+SiLU) returning (int8 tensor, per-sample scales).

    Inference-only (int8 rounding has no useful gradient). Off-TPU or for
    unsupported shapes it falls back to the reference + quantize_per_sample.
    """
    if jax.default_backend() == "tpu" and _supported(x):
        return _gn_silu_quant_pallas(x, scale, bias, num_groups, eps, apply_silu)
    from gddim_tpu.ops.conv3x3 import quantize_per_sample

    out = group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
    return quantize_per_sample(out)


# 'pallas' (default): fused VMEM kernel on TPU. 'xla': plain lowering — a
# Pallas call is a fusion barrier, so letting XLA fuse the norm chain into
# neighbors can win when the graph around it is fusion-rich (benchmarked).
GN_IMPL = "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-6,
                    apply_silu: bool = True):
    """Fused GroupNorm(+SiLU); Pallas forward on TPU, XLA elsewhere."""
    if GN_IMPL == "pallas" and jax.default_backend() == "tpu" and _supported(x):
        return _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu)
    return group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)


def _supported(x) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    return c % 128 == 0 and (h * w) % 8 == 0


def _fwd(x, scale, bias, num_groups, eps, apply_silu):
    out = group_norm_silu(x, scale, bias, num_groups, eps, apply_silu)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, apply_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu_reference(
            xx, ss, bb, num_groups, eps, apply_silu
        ),
        x,
        scale,
        bias,
    )
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)
