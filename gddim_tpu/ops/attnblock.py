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


def _quant_2d(a):
    """(n, C) f32 -> (int8, scalar scale), symmetric."""
    s = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
    return q, s


def _attnblock_kernel(
    x_ref, gns_ref, gnb_ref, p_ref, wq_ref, bq_ref, wqs_ref,
    wk_ref, bk_ref, wks_ref, wv_ref, bv_ref, wvs_ref,
    wo_ref, bo_ref, wos_ref, *rest,
    bt, n, c, inv_n, eps, rescale, mm_dtype, static_scales=False,
):
    """int8 mm_dtype: the four NIN projections run on the int8 MXU path with
    per-sample activation quantization in-kernel (weights arrive int8 with
    per-output-channel scales in w*s_ref); the (n, n) attention matmuls stay
    bf16 — they are <1/3 of the block's FLOPs and softmax needs f32 anyway.

    static_scales: a qs_ref operand carries [1/s_h, 1/s_a] calibrated inverse
    activation scales; amax reductions are skipped and the w*s rows arrive
    pre-multiplied by the activation scale.
    """
    rest = list(rest)
    qs_ref = rest.pop(0) if static_scales else None
    (o_ref,) = rest
    int8 = mm_dtype == jnp.int8
    attn_dtype = jnp.bfloat16 if int8 else mm_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8 else jnp.float32,
        )

    scale = c ** (-0.5)

    # --- pass 1: GroupNorm (+quant), stacked to (bt*n, c) ------------------
    # The four NIN projections then run as ONE matmul each at M = bt*n rows
    # instead of bt back-to-back M = n matmuls: at the model's n=256 shapes
    # the per-sample M is only 2 MXU row-tiles, and batching across the tile
    # keeps the systolic array fed between samples.
    if static_scales or not int8:
        # tile-vectorized GN (see resblock.py v2): segment stats over axis 1,
        # per-(sample, channel) affine broadcast — no per-sample VPU unroll
        x3 = x_ref[...].astype(jnp.float32)  # (bt, n, c)
        s_bt = jnp.sum(x3, axis=1)
        sq_bt = jnp.sum(x3 * x3, axis=1)
        mean = jax.lax.dot(s_bt, p_ref[...], preferred_element_type=jnp.float32) * inv_n
        esq = jax.lax.dot(sq_bt, p_ref[...], preferred_element_type=jnp.float32) * inv_n
        a_aff = jax.lax.rsqrt(esq - mean * mean + eps) * gns_ref[...]
        b_aff = gnb_ref[...] - mean * a_aff
        h3 = x3 * a_aff[:, None, :] + b_aff[:, None, :]
        if int8:
            h3 = jnp.clip(jnp.round(h3 * qs_ref[0, 0]), -127, 127).astype(jnp.int8)
        h_all = h3.reshape(bt * n, c)
        h_scales = [1.0] * bt
    else:  # dynamic int8: per-sample amax needs the unrolled loop
        h_rows, h_scales = [], []
        for s in range(bt):
            x = x_ref[s].astype(jnp.float32)  # (n, c)
            h = _gn_2d(x, p_ref[...], gns_ref[0], gnb_ref[0], inv_n, eps)
            h, hs = _quant_2d(h)
            h_scales.append(hs)
            h_rows.append(h)
        h_all = jnp.concatenate(h_rows, axis=0) if bt > 1 else h_rows[0]
    q_all = mm(h_all, wq_ref[...])
    k_all = mm(h_all, wk_ref[...])
    v_all = mm(h_all, wv_ref[...])

    # --- pass 2: per-sample attention on sliced rows -----------------------
    a_rows, a_scales = [], []
    for s in range(bt):
        rows = slice(s * n, (s + 1) * n)
        if int8:
            hs = h_scales[s]
            q = q_all[rows].astype(jnp.float32) * (hs * wqs_ref[0]) + bq_ref[0]
            k = k_all[rows].astype(jnp.float32) * (hs * wks_ref[0]) + bk_ref[0]
            v = v_all[rows].astype(jnp.float32) * (hs * wvs_ref[0]) + bv_ref[0]
        else:
            q = q_all[rows] + bq_ref[0]
            k = k_all[rows] + bk_ref[0]
            v = v_all[rows] + bv_ref[0]
        logits = jax.lax.dot_general(
            q.astype(attn_dtype), k.astype(attn_dtype),
            (((1,), (1,)), ((), ())),  # q @ k^T
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits - jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        a = jax.lax.dot_general(
            p.astype(attn_dtype), v.astype(attn_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if int8:
            if static_scales:
                a = jnp.clip(jnp.round(a * qs_ref[0, 1]), -127, 127).astype(jnp.int8)
                a_scales.append(1.0)
            else:
                a, asc = _quant_2d(a)
                a_scales.append(asc)
        a_rows.append(a)

    # --- pass 3: batched out-projection + epilogue -------------------------
    a_all = jnp.concatenate(a_rows, axis=0) if bt > 1 else a_rows[0]
    o_all = mm(a_all, wo_ref[...])
    if static_scales or not int8:  # tile-vectorized epilogue
        o3 = o_all.reshape(bt, n, c).astype(jnp.float32)
        if int8:
            o3 = o3 * wos_ref[...][None]
        out = x_ref[...].astype(jnp.float32) + o3 + bo_ref[...][None]
        if rescale:
            out = out * _INV_SQRT2
        o_ref[...] = out.astype(o_ref.dtype)
    else:  # dynamic int8: per-sample dequant scales
        for s in range(bt):
            rows = slice(s * n, (s + 1) * n)
            o = o_all[rows].astype(jnp.float32) * (a_scales[s] * wos_ref[0]) + bo_ref[0]
            out = x_ref[s].astype(jnp.float32) + o
            if rescale:
                out = out * _INV_SQRT2
            o_ref[s] = out.astype(o_ref.dtype)


def fused_attnblock(
    x, gn_scale, gn_bias, wq, bq, wk, bk, wv, bv, wo, bo,
    *, num_groups: int, eps: float = 1e-6, skip_rescale: bool = False,
    mm_dtype=jnp.bfloat16, act_scales=None,
):
    """x: (B, H, W, C); NIN weights (C, C) with (C,) biases.

    act_scales (int8 only): calibrated (s_h, s_a) static activation scales —
    skips the per-sample amax reductions in the kernel.
    """
    import os

    int8 = mm_dtype == jnp.int8
    static = bool(int8 and act_scales is not None)
    b, h, w_, c = x.shape
    n = h * w_
    bt = 1
    itemsize = jnp.dtype(x.dtype).itemsize
    bt_env = int(os.environ.get("GDDIM_ATTN_BT", "0"))  # A/B escape hatch
    if bt_env and b % bt_env == 0:
        bt = bt_env
    for cand in () if bt_env else (8, 4, 2, 1):
        need = (
            2 * 2 * cand * n * c * itemsize  # in/out blocks, double-buffered
            + 4 * c * c * 4 + c * c * 4  # weights + indicator
            # batched projections: h_all/a_all + q/k/v/o accumulators over
            # the whole tile (int32 worst case), per-sample scores f32
            + 6 * cand * n * c * 4
            + (2 * n * c + n * n) * 4
        )
        # 20 MB by this (conservative) accounting measured-compilable on the
        # chip; bt=8 at 16x16/c=256 (19 MB) runs 7% faster than bt=4
        if b % cand == 0 and need <= 20 * 2**20:
            bt = cand
            break
    inv_n = 1.0 / (n * (c // num_groups))
    kernel = functools.partial(
        _attnblock_kernel, bt=bt, n=n, c=c, inv_n=inv_n, eps=eps,
        rescale=skip_rescale, mm_dtype=mm_dtype, static_scales=static,
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)

    def mat(v):
        """-> (kernel weight operand, (1, C) dequant scale row)."""
        wm = jnp.asarray(v, jnp.float32)
        if not int8:
            return wm, jnp.ones((1, wm.shape[-1]), jnp.float32)
        sc = jnp.maximum(jnp.abs(wm).max(axis=0), 1e-12) / 127.0
        q = jnp.clip(jnp.round(wm / sc), -127, 127).astype(jnp.int8)
        return q, sc.reshape(1, -1)

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    wq_op, wq_sc = mat(wq)
    wk_op, wk_sc = mat(wk)
    wv_op, wv_sc = mat(wv)
    wo_op, wo_sc = mat(wo)
    args = [
        x.reshape(b, n, c),
        row(gn_scale), row(gn_bias), _group_indicator(c, num_groups),
        wq_op, row(bq), wq_sc, wk_op, row(bk), wk_sc,
        wv_op, row(bv), wv_sc, wo_op, row(bo), wo_sc,
    ]
    if static:
        s_h, s_a = act_scales
        for i in (6, 9, 12):  # wq/wk/wv scale rows pre-multiplied by s_h
            args[i] = args[i] * s_h
        args[15] = args[15] * s_a
        qs = jnp.zeros((1, 128), jnp.float32)
        qs = qs.at[0, 0].set(1.0 / s_h).at[0, 1].set(1.0 / s_a)
        args.append(qs)
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((1, c)), const((1, c)), const((c, c)),
            const((c, c)), const((1, c)), const((1, c)),
            const((c, c)), const((1, c)), const((1, c)),
            const((c, c)), const((1, c)), const((1, c)),
            const((c, c)), const((1, c)), const((1, c)),
        ] + ([const((1, 128))] if static else []),
        out_specs=pl.BlockSpec(
            (bt, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
    )(*args)
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
    # n >= 8 keeps the (n, c) tiles on whole sublanes; small n (the 4x4
    # middle block, n=16) pads within Mosaic's layouts and still wins by
    # keeping the block's ~6 HBM round-trips in VMEM.
    b, h, w, c = x_shape
    n = h * w
    return (
        jax.default_backend() == "tpu"
        and c % 128 == 0
        and n % 8 == 0
        and (3 * n * c + n * n + n * c) * 4 + 5 * c * c * 4 < 8 * 2**20
    )


def make_fused_attnblock_train(
    *, num_groups: int, eps: float = 1e-6, skip_rescale: bool = False,
    mm_dtype=None,
):
    """Differentiable fused attention block for TRAINING.

    Forward: the fused Pallas kernel (bf16 MXU, one HBM read of x / write
    of out; the (S, S) score matrix never leaves VMEM). Backward: jax.vjp
    of the unfused XLA composition recomputed from the saved primal inputs
    — the make_fused_resblock_train pattern (ops/resblock.py). Gradients
    are exactly the unfused path's; the forward/backward value skew is the
    kernel-vs-XLA bf16 difference.

    Returns f(x, gn_scale, gn_bias, wq, bq, wk, bk, wv, bv, wo, bo).
    """
    mmdt = mm_dtype or jnp.bfloat16
    kw = dict(num_groups=num_groups, eps=eps, skip_rescale=skip_rescale)

    @jax.custom_vjp
    def f(x, gns, gnb, wq, bq, wk, bk, wv, bv, wo, bo):
        if jax.default_backend() == "tpu" and supported(x.shape):
            return fused_attnblock(
                x, gns, gnb, wq, bq, wk, bk, wv, bv, wo, bo,
                mm_dtype=mmdt, **kw,
            )
        return attnblock_reference(x, gns, gnb, wq, bq, wk, bk, wv, bv, wo, bo, **kw)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: attnblock_reference(*a, **kw), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
