"""Pallas 3x3 convolution kernel (stride 1, SAME) as 9 shifted MXU matmuls.

Motivation (measured on the target chip, PERF.md): XLA's conv lowering
sustains only 27-38 TF/s bf16 while plain matmuls reach ~154 TF/s — and 3x3
convs carry ~90% of the score U-Net's FLOPs. This kernel reads each input
tile into VMEM once and accumulates

    out[h, w, :] = sum_{dy, dx} x[h+dy, w+dx, :] @ W[dy, dx, :, :]

as nine (Bt*H*W, C) @ (C, Cout) MXU matmuls against the resident tile, with
f32 accumulation. The input is pre-padded by one pixel on the host graph (one
cheap XLA pad), so the kernel body has no boundary conditions.

Supported: stride 1, dilation 1, C and Cout multiples of 128 (the stem and
head convs with tiny channel counts fall back to XLA). Gradients fall back to
XLA via custom_vjp like the other fused ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_xla(x, w, stride: int = 1, dilation: int = 1):
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_kernel(x_ref, w_ref, o_ref, acc_ref, *, h, w, cin, cout, bt):
    """x_ref: (bt, h+2, w+2, cin) pre-padded; w_ref: (9, cin, cout)."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            tile = x_ref[:, dy : dy + h, dx : dx + w, :]  # (bt, h, w, cin)
            mat = tile.reshape(bt * h * w, cin)
            acc_ref[...] += jax.lax.dot_general(
                mat,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc_ref[...].reshape(bt, h, w, cout).astype(o_ref.dtype)


def _pick_bt(b, h, w, cin, cout, itemsize, budget=13 * 2**20):
    """Largest batch tile whose buffers fit the VMEM budget.

    Grid-iterated input/output blocks are double-buffered by the Pallas
    pipeline (2x) and padded to the dtype's native tiling ((8,128) f32/bf16,
    (32,128) int8) on the last two dims; the budget leaves headroom under the
    16MB scoped-vmem limit.
    """
    sub = 32 if itemsize == 1 else (16 if itemsize == 2 else 8)

    def pad(n, m):
        return -(-n // m) * m

    for bt in (16, 8, 4, 2, 1):
        if b % bt:
            continue
        in_tile = bt * (h + 2) * pad(w + 2, sub) * pad(cin, 128) * itemsize
        out_tile = bt * h * pad(w, sub) * pad(cout, 128) * itemsize
        need = (
            2 * in_tile  # double-buffered input
            + bt * h * w * cout * 4  # f32/int32 accumulator
            + 2 * out_tile  # double-buffered output
            + 9 * cin * cout * itemsize  # weights
        )
        if need <= budget:
            return bt
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_pallas(x, w):
    """(B, H, W, C) conv with (3, 3, C, Cout) weights, stride 1, SAME."""
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bt = _pick_bt(b, h, ww, cin, cout, x.dtype.itemsize)
    wr = w.reshape(9, cin, cout)
    kernel = functools.partial(
        _conv_kernel, h=h, w=ww, cin=cin, cout=cout, bt=bt
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h + 2, ww + 2, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, ww, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, ww, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt * h * ww, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ww * 9 * cin * cout,
            bytes_accessed=(b * h * ww * (cin + cout) + 9 * cin * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wr)


def _fwd(x, w):
    return conv3x3_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, wW: conv3x3_xla(xx, wW), x, w)
    return vjp(g)


conv3x3_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# int8 inference path
# ---------------------------------------------------------------------------
#
# The MXU runs int8 x int8 -> int32 at ~1.6x the bf16 rate on this chip
# (measured: 252 TOP/s vs 159 TF/s). Sampling is inference-only, so the conv
# stacks can run with per-tensor dynamically-quantized activations and
# per-output-channel weight scales; the dequant (+ optional bias) epilogue is
# fused into the kernel so the int32 accumulator never touches HBM.


def quantize_per_tensor(x):
    """Symmetric per-tensor int8 quantization with a dynamic scale.

    Returns (q, scale) with x ~= q * scale. The abs-max reduction fuses into
    the surrounding XLA graph.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_per_sample(x):
    """Symmetric PER-SAMPLE int8 quantization: scale[b] = amax(x[b]) / 127.

    Finer than per-tensor (each image gets its own dynamic range — activations
    across a diffusion batch at different effective noise levels vary widely)
    and the reduction is per-row so XLA fuses it into the producer.
    Returns (q, scales) with x[b] ~= q[b] * scales[b]; scales shape (B,).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=tuple(range(1, x.ndim)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    srow = scale.reshape((-1,) + (1,) * (x.ndim - 1))
    q = jnp.clip(jnp.round(xf / srow), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight_per_channel(w):
    """(3,3,Cin,Cout) weights -> (int8 weights, (Cout,) f32 scales)."""
    w = np.asarray(w, dtype=np.float32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    q = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return q, sw.astype(np.float32)


def _conv_kernel_int8(x_ref, w_ref, wscale_ref, ascale_ref, bias_ref, o_ref,
                      acc_ref, *, h, w, cin, cout, bt):
    """x_ref: (bt, h+2, w+2, cin) int8 pre-padded; w_ref: (9, cin, cout) int8;
    wscale_ref: (1, cout) f32 per-channel weight scales; ascale_ref: (B, 1)
    f32 per-sample activation scales (whole array resident — TPU block shapes
    must tile (8, 128) or equal the array, so the tiny scale vector loads once
    and each grid step dynamic-slices its bt rows); bias_ref: (1, cout)."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            tile = x_ref[:, dy : dy + h, dx : dx + w, :]
            mat = tile.reshape(bt * h * w, cin)
            acc_ref[...] += jax.lax.dot_general(
                mat,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    deq = acc_ref[...].astype(jnp.float32).reshape(bt, h, w, cout)
    a_tile = ascale_ref[pl.ds(pl.program_id(0) * bt, bt), :]
    deq = deq * (a_tile.reshape(bt, 1, 1, 1) * wscale_ref[0])
    o_ref[...] = (deq + bias_ref[0]).astype(o_ref.dtype)


def conv3x3_pallas_int8(x8, w8, w_scale, act_scale, bias=None,
                        out_dtype=jnp.bfloat16):
    """int8 3x3 SAME conv.

    x8 (B,H,W,C) int8; w8 (3,3,C,Cout) or (9,C,Cout) int8; w_scale () or
    (Cout,) f32 per-channel weight scales; act_scale () or (B,) f32 dynamic
    activation scales (quantize_per_sample / quantize_per_tensor); optional
    f32 bias fused into the dequant epilogue.
    """
    b, h, ww, cin = x8.shape
    cout = w8.shape[-1]
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wr = w8.reshape(9, cin, cout)
    wscale_row = jnp.broadcast_to(
        jnp.asarray(w_scale, jnp.float32).reshape(1, -1), (1, cout)
    )
    ascale_col = jnp.broadcast_to(
        jnp.asarray(act_scale, jnp.float32).reshape(-1, 1), (b, 1)
    )
    bias_row = (
        jnp.zeros((1, cout), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32).reshape(1, cout)
    )
    bt = _pick_bt(b, h, ww, cin, cout, 1)
    kernel = functools.partial(
        _conv_kernel_int8, h=h, w=ww, cin=cin, cout=cout, bt=bt
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h + 2, ww + 2, cin), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, ww, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, ww, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt * h * ww, cout), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ww * 9 * cin * cout,
            bytes_accessed=b * h * ww * (cin + 2 * cout) + 9 * cin * cout,
            transcendentals=0,
        ),
    )(xp, wr, wscale_row, ascale_col, bias_row)


def supported(x_shape, w_shape, stride: int, dilation: int) -> bool:
    b, h, w, cin = x_shape
    cout = w_shape[-1]
    return (
        jax.default_backend() == "tpu"
        and stride == 1
        and dilation == 1
        and cin % 128 == 0
        and cout % 128 == 0
        and w_shape[:2] == (3, 3)
    )
