"""Fused residual-block Pallas kernel (inference fast path).

Cost analysis of the compiled NCSN++ eps function (PERF.md) shows the model
is HBM-heavy: ~12 GB of activation traffic per batch-64 eval — and per-op
kernels cannot reduce it, because every pallas_call is a fusion barrier that
forces its operands through HBM.

This kernel executes an ENTIRE BigGAN/DDPM residual block
(reference layerspp.py:146-227):

    h = silu(GN1(x))
    h = conv3x3(h, W1) + b1 + temb_proj[:, None, None, :]
    h = silu(GN2(h))
    h = conv3x3(h, W2) + b2            (dropout is identity at eval)
    out = (x or conv1x1(x, Ws)) + h    [* 1/sqrt(2) with skip_rescale]

per batch-tile (bt samples) entirely in VMEM: x is read from HBM once and
the block output written once — 2 passes instead of the ~10 the unfused
chain costs. The batch tile keeps the 9-shift matmuls at M = bt*H*W rows so
the MXU stays fed even at 8x8/16x16 feature maps. Group statistics use the
(C, C) same-group indicator matmul (one MXU pass, no lane reshapes).

Applies to stride-1 blocks without in-block resampling, C and C_out
multiples of 128. Training uses make_fused_resblock_train: the same kernel
as the forward (with the dropout mask applied in-kernel) and an
XLA-recomputed backward via jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.ops.groupnorm import _group_indicator

_INV_SQRT2 = 0.7071067811865476

# matmul precision inside the kernel (tests override to f32 for exact
# comparison against the XLA composition)
MM_DTYPE = jnp.bfloat16


def _gn_silu_2d(x, pmat, scale, bias, inv_n, eps):
    """x: (n, C) f32 -> silu(GroupNorm(x)), one sample (all ops rank-2:
    Mosaic's vector layouts are only robust for <=2-D shapes here)."""
    s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    mean = jax.lax.dot(s, pmat, preferred_element_type=jnp.float32) * inv_n
    esq = jax.lax.dot(sq, pmat, preferred_element_type=jnp.float32) * inv_n
    var = esq - mean * mean
    norm = (x - mean) * jax.lax.rsqrt(var + eps)
    out = norm * scale + bias
    return out * jax.nn.sigmoid(out)


def _quant_2d(a):
    """(n, C) f32 -> (int8, scalar scale), symmetric."""
    s = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_2d_static(a, inv_s):
    """(n, C) f32 -> int8 with a calibrated static scale (no amax pass)."""
    return jnp.clip(jnp.round(a * inv_s), -127, 127).astype(jnp.int8)


# margin applied to calibrated amaxes: sampling-time activations exceed the
# calibration sweep's by up to ~1.35x on trained weights (measured: order0
# nfe=12 batch=8 calibration vs nfe=50 batch=64 capture on the trained calib
# checkpoint — worst site ratio 1.354). Clipped eps predictions feed back
# through the ODE and compound over the trajectory, so under-coverage costs
# far more fidelity than the ~0.4 bit of int8 range the margin spends.
CALIB_MARGIN = 1.5


def act_scales_from_amax(amaxes):
    """(amax...) -> (scale...) rows for the static-scale kernel path."""
    return tuple(
        None if a is None
        else jnp.maximum(jnp.asarray(a, jnp.float32), 1e-12) * (CALIB_MARGIN / 127.0)
        for a in amaxes
    )


def _conv9(h_pad_ref, w_ref, bt, h, w, cin, cout, dtype):
    """9 shifted matmuls over the VMEM-resident padded tiles (bt samples)."""
    int8 = dtype == jnp.int8
    acc_t = jnp.int32 if int8 else jnp.float32
    # A/B escape hatch: split wide contractions into chunks of this many
    # lanes (e.g. 128) — probes whether Mosaic's K>128 dot scheduling is the
    # pair kernels' rate limiter at N=128 outputs. 0 = single full-K dot.
    splitk = int(_os.environ.get("GDDIM_CONV9_SPLITK", "0"))
    acc = jnp.zeros((bt * h * w, cout), acc_t)
    for dy in range(3):
        for dx in range(3):
            tile = h_pad_ref[:, dy : dy + h, dx : dx + w, :]
            t2d = tile.reshape(bt * h * w, cin).astype(dtype)
            wk = w_ref[dy * 3 + dx].astype(dtype)
            if splitk and cin > splitk and cin % splitk == 0:
                for k0 in range(0, cin, splitk):
                    acc += jax.lax.dot_general(
                        t2d[:, k0 : k0 + splitk],
                        wk[k0 : k0 + splitk],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t,
                    )
            else:
                acc += jax.lax.dot_general(
                    t2d, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t,
                )
    return acc


def _conv9_scatter(xs, w_ref, bt, h, w, cout, dtype, group=None):
    """Scatter-form 3x3 conv: contiguous wide-N matmuls + shifted VPU adds.

    The gather form (_conv9) pays a strided-window relayout per tap: each of
    the 9 shifted slices of the padded VMEM tile is copied into matmul
    layout before its dot. The round-4 slope probe (scripts/
    exp_shape_pure.py) showed the marginal MXU rate at the model's K=N=128
    shape is ~2x the gather kernels' conv floor — the relayouts, not the
    MXU, are the 32x32 level's limiter. Here the matmul input is the
    UNPADDED contiguous tile (no relayout); taps are concatenated along N
    (lane-aligned slices), and the 3x3 shifts move to the epilogue as
    zero-padded VPU adds where no matmul layout is required.

    xs: list of (bt*h*w, k_i) activation values (already in mm dtype) whose
        k_i sum to cin — pairs pass [oa, ob] and skip the concat entirely.
    w_ref: (cin, 9*cout) — tap-major along N, packed by the wrappers.
    group: taps per matmul (1..9). 9 = one (M, 9*cout) intermediate
        (fastest form, most VMEM); 3 = three (M, 3*cout) rounds (default —
        bounds the int32 intermediate at 1/3). Env GDDIM_CONV9_GROUP.
    """
    group = group or _conv9_group_for(h * w, sum(x.shape[1] for x in xs))
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    out = jnp.zeros((bt, h, w, cout), acc_t)
    taps = [(dy, dx) for dy in range(3) for dx in range(3)]
    for g0 in range(0, 9, group):
        gtaps = taps[g0 : g0 + group]
        y = None
        k0 = 0
        for x2d in xs:
            k1 = k0 + x2d.shape[1]
            wg = w_ref[k0:k1, g0 * cout : (g0 + len(gtaps)) * cout]
            t = jax.lax.dot_general(
                x2d, wg.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            y = t if y is None else y + t
            k0 = k1
        for j, (dy, dx) in enumerate(gtaps):
            # out[b, oy, ox] += Y[b, oy+dy-1, ox+dx-1, tap]
            yt = y[:, j * cout : (j + 1) * cout].reshape(bt, h, w, cout)
            oy0, oy1 = max(0, 1 - dy), h - max(0, dy - 1)
            ox0, ox1 = max(0, 1 - dx), w - max(0, dx - 1)
            iy0, ix0 = oy0 + dy - 1, ox0 + dx - 1
            sl = yt[:, iy0 : iy0 + (oy1 - oy0), ix0 : ix0 + (ox1 - ox0), :]
            out = out + jax.lax.pad(
                sl, jnp.zeros((), acc_t),
                ((0, 0, 0), (oy0, h - oy1, 0), (ox0, w - ox1, 0), (0, 0, 0)),
            )
    return out.reshape(bt * h * w, cout)


def _pack_w_scatter(q):
    """(9, cin, cout) prepped weights -> (cin, 9*cout) tap-major-N layout."""
    return q.transpose(1, 0, 2).reshape(q.shape[1], 9 * q.shape[2])


def _resblock_kernel(
    x_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1_ref, b1_ref, w1sc_ref,
    gn2s_ref, gn2b_ref, p2_ref, w2_ref, b2_ref, w2sc_ref,
    wskip_ref, bskip_ref, wsksc_ref,
    *rest,
    bt, h, w, cin, cout, inv_n1, inv_n2, eps, has_skip, rescale, mm_dtype,
    apply_gn1=True, separate_skip=False, static_scales=False, static_skip=True,
    has_mask=False, inv_keep=1.0, conv_impl="gather",
):
    """bt samples per grid step; all weights + the tiles resident in VMEM.

    Matmuls run batched at M = bt*h*w; the per-sample pieces (GroupNorm
    statistics, quantization scales, epilogues) run as rank-2 ops in an
    unrolled python loop over the tile — Mosaic's vector layouts mis-lower
    some rank-3 broadcast patterns, and bt <= 16 keeps the unroll small.

    mm_dtype == int8: activations are quantized per sample INSIDE the kernel
    (no HBM cost), weights arrive int8 with per-channel scales in w*sc_ref,
    and the int32 accumulators are dequantized in the epilogues.

    Up/down transition blocks (tail mode): apply_gn1=False means x_ref
    already holds silu(GN1(x)) resampled outside the kernel, and
    separate_skip=True adds an xskip_ref operand (the resampled residual
    input) that the skip projection consumes instead of x_ref.

    static_scales (int8 only): a qs_ref operand carries calibrated inverse
    activation scales [1/s1, 1/s2, 1/sx]; the per-sample amax reductions are
    skipped and the dequant scale rows arrive pre-multiplied by s_act.
    """
    assert conv_impl == "gather", "v1 (per-sample amax) supports gather only"
    rest = list(rest)
    xskip_ref = rest.pop(0) if separate_skip else x_ref
    qs_ref = rest.pop(0) if static_scales else None
    mask_ref = rest.pop(0) if has_mask else None
    o_ref, hpad_ref, hpad2_ref = rest
    int8 = mm_dtype == jnp.int8
    n = h * w

    # the pad borders stay zero across grid steps (scratch persists and the
    # interior writes never touch them): one memset on the first step instead
    # of a full-buffer zero per step
    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        hpad_ref[...] = jnp.zeros_like(hpad_ref)
        hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    # --- GN1 + SiLU into the zero-padded conv buffer, per sample -----------
    s1s = []
    for s in range(bt):
        if apply_gn1:
            a1 = _gn_silu_2d(
                x_ref[s].astype(jnp.float32), p1_ref[...], gn1s_ref[0],
                gn1b_ref[0], inv_n1, eps,
            )
        else:  # tail mode: x_ref already holds silu(GN1(x)), resampled
            a1 = x_ref[s].astype(jnp.float32)
        if int8:
            if static_scales:
                a1 = _quant_2d_static(a1, qs_ref[0, 0])
            else:
                a1, sc = _quant_2d(a1)
                s1s.append(sc)
        hpad_ref[s, 1 : h + 1, 1 : w + 1, :] = a1.reshape(h, w, cin).astype(
            hpad_ref.dtype
        )

    # --- conv1 (batched) + bias + temb, then GN2 + SiLU per sample ---------
    acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    s2s = []
    for s in range(bt):
        acc_s = acc[s * n : (s + 1) * n].astype(jnp.float32)
        if int8:
            # static mode: w1sc arrives pre-multiplied by the s1 act scale
            acc_s = acc_s * (w1sc_ref[0] if static_scales else s1s[s] * w1sc_ref[0])
        # temb arrives pre-broadcast as (B, 8, Cout): row 0 of this sample
        acc_s = acc_s + b1_ref[0] + temb_ref[s, 0:1, :]
        a2 = _gn_silu_2d(
            acc_s, p2_ref[...], gn2s_ref[0], gn2b_ref[0], inv_n2, eps
        )
        if has_mask:  # training dropout: mask arrives int8 {0,1}
            a2 = a2 * (mask_ref[s].astype(jnp.float32) * inv_keep)
        if int8:
            if static_scales:
                a2 = _quant_2d_static(a2, qs_ref[0, 1])
            else:
                a2, sc2 = _quant_2d(a2)
                s2s.append(sc2)
        hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a2.reshape(h, w, cout).astype(
            hpad2_ref.dtype
        )

    # --- conv2 (batched) + per-sample epilogue: bias + skip + residual -----
    acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    for s in range(bt):
        x_s = xskip_ref[s].astype(jnp.float32)  # (n, cin)
        h_s = acc2[s * n : (s + 1) * n].astype(jnp.float32)
        if int8:
            h_s = h_s * (w2sc_ref[0] if static_scales else s2s[s] * w2sc_ref[0])
        h_s = h_s + b2_ref[0]
        if has_skip:
            # the skip site sees PRE-norm activations whose amax is
            # input-dependent (unlike a1/a2 behind GroupNorm), so static int8
            # scales are only sound when the caller opts in. Otherwise the
            # 1x1 projection runs bf16: it is ~1/18 of the block's FLOPs, so
            # a whole-tile amax+quant+round pass costs more than int8 saves
            # (wskip_ref then arrives bf16 from the host-side prep).
            if int8 and static_scales and static_skip:
                xq = _quant_2d_static(x_s, qs_ref[0, 2])
                skip = jax.lax.dot_general(
                    xq, wskip_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * wsksc_ref[0] + bskip_ref[0]
            else:
                wdt = jnp.bfloat16 if int8 else mm_dtype
                skip = jax.lax.dot_general(
                    x_s.astype(wdt), wskip_ref[...].astype(wdt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bskip_ref[0]
        else:
            skip = x_s
        out = skip + h_s
        if rescale:
            out = out * _INV_SQRT2
        o_ref[s] = out.astype(o_ref.dtype)


def _resblock_kernel_v2(
    x_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1_ref, b1_ref, w1sc_ref,
    gn2s_ref, gn2b_ref, p2_ref, w2_ref, b2_ref, w2sc_ref,
    wskip_ref, bskip_ref, wsksc_ref,
    *rest,
    bt, h, w, cin, cout, inv_n1, inv_n2, eps, has_skip, rescale, mm_dtype,
    apply_gn1=True, separate_skip=False, static_scales=False, static_skip=True,
    has_mask=False, inv_keep=1.0, conv_impl="gather",
):
    """Loop-free variant of _resblock_kernel (static-scale int8 and bf16
    modes only — no per-sample amax reductions are needed there).

    conv_impl='scatter': convs run as _conv9_scatter on the contiguous tile
    values — the padded scratches are never touched (the wrapper passes
    dummies) and w*_ref arrive in the (cin, 9*cout) packed layout.

    v1 unrolls a python loop of bt rank-2 sample slices for the GroupNorm /
    quantize / epilogue stages; each iteration's VPU chain serializes against
    the MXU. v2 vectorizes all per-sample math across the whole (bt, n, C)
    tile: segment statistics reduce over axis 1, the normalize/activate/
    quantize chain and the epilogues run once over the full tile, and the
    scale/shift rows broadcast from (bt, 1, C). Per-sample work that remains
    is only the padded-scratch stores (cheap data movement).
    """
    rest = list(rest)
    xskip_ref = rest.pop(0) if separate_skip else x_ref
    qs_ref = rest.pop(0) if static_scales else None
    mask_ref = rest.pop(0) if has_mask else None
    o_ref, hpad_ref, hpad2_ref = rest
    int8 = mm_dtype == jnp.int8
    n = h * w
    scatter = conv_impl == "scatter"

    if not scatter:

        @pl.when(pl.program_id(0) == 0)
        def _zero_borders():
            hpad_ref[...] = jnp.zeros_like(hpad_ref)
            hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    def gn_silu_tile(x3, pmat, scale_ref2, bias_ref2, inv_n):
        """(bt, n, C) f32 -> silu(GroupNorm(x)) per sample, vectorized."""
        s = jnp.sum(x3, axis=1)  # (bt, C)
        sq = jnp.sum(x3 * x3, axis=1)
        mean = jax.lax.dot(s, pmat, preferred_element_type=jnp.float32) * inv_n
        esq = jax.lax.dot(sq, pmat, preferred_element_type=jnp.float32) * inv_n
        var = esq - mean * mean
        # fold GN into a per-(sample, channel) affine: out = x*A + B
        a = jax.lax.rsqrt(var + eps) * scale_ref2[...]  # (bt, C) * (1, C)
        bb = bias_ref2[...] - mean * a
        out = x3 * a[:, None, :] + bb[:, None, :]
        return out * jax.nn.sigmoid(out)

    # --- GN1 + SiLU (+static quant) over the whole tile --------------------
    x3 = x_ref[...].astype(jnp.float32)  # (bt, n, cin)
    if apply_gn1:
        a1 = gn_silu_tile(x3, p1_ref[...], gn1s_ref, gn1b_ref, inv_n1)
    else:  # tail mode: x_ref already holds silu(GN1(x)), resampled
        a1 = x3
    if int8:
        a1 = jnp.clip(jnp.round(a1 * qs_ref[0, 0]), -127, 127).astype(jnp.int8)

    # --- conv1 (batched) + bias + temb + GN2 + SiLU (+quant) ---------------
    if scatter:
        acc = _conv9_scatter(
            [a1.reshape(bt * n, cin).astype(mm_dtype)],
            w1_ref, bt, h, w, cout, mm_dtype,
        )
    else:
        for s in range(bt):  # scratch interior stores stay per-sample (layout)
            hpad_ref[s, 1 : h + 1, 1 : w + 1, :] = a1[s].reshape(
                h, w, cin
            ).astype(hpad_ref.dtype)
        acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    acc3 = acc.reshape(bt, n, cout).astype(jnp.float32)
    if int8:  # w1sc arrives pre-multiplied by the static s1 act scale
        acc3 = acc3 * w1sc_ref[...][None]
    acc3 = acc3 + b1_ref[...][None] + temb_ref[:, 0:1, :]
    a2 = gn_silu_tile(acc3, p2_ref[...], gn2s_ref, gn2b_ref, inv_n2)
    if has_mask:  # training dropout: mask arrives int8 {0,1}
        a2 = a2 * (mask_ref[...].astype(jnp.float32) * inv_keep)
    if int8:
        a2 = jnp.clip(jnp.round(a2 * qs_ref[0, 1]), -127, 127).astype(jnp.int8)

    # --- conv2 (batched) + epilogue + skip (batched) -----------------------
    if scatter:
        acc2 = _conv9_scatter(
            [a2.reshape(bt * n, cout).astype(mm_dtype)],
            w2_ref, bt, h, w, cout, mm_dtype,
        )
    else:
        for s in range(bt):
            hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a2[s].reshape(
                h, w, cout
            ).astype(hpad2_ref.dtype)
        acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    h3 = acc2.reshape(bt, n, cout).astype(jnp.float32)
    if int8:
        h3 = h3 * w2sc_ref[...][None]
    h3 = h3 + b2_ref[...][None]
    xs = xskip_ref[...].astype(jnp.float32)  # (bt, n, cin)
    if has_skip:
        xs2 = xs.reshape(bt * n, cin)
        if int8 and static_scales and static_skip:
            xq = jnp.clip(
                jnp.round(xs2 * qs_ref[0, 2]), -127, 127
            ).astype(jnp.int8)
            skip = jax.lax.dot_general(
                xq, wskip_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * wsksc_ref[...]
        else:
            wdt = jnp.bfloat16 if int8 else mm_dtype
            skip = jax.lax.dot_general(
                xs2.astype(wdt), wskip_ref[...].astype(wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        skip = skip.reshape(bt, n, cout) + bskip_ref[...][None]
    else:
        skip = xs
    out = skip + h3
    if rescale:
        out = out * _INV_SQRT2
    o_ref[...] = out.astype(o_ref.dtype)


# fused-resblock kernel body: 'v1' = per-sample rank-2 unroll (always valid),
# 'v2' = loop-free tile-vectorized (static-scale int8 / bf16 only; dynamic
# per-sample quantization needs v1's amax loop). Chip A/B (round 4): with the
# scatter conv form, v2 wins at EVERY level (end-to-end 96.2 vs 83.5 img/s,
# PERF.md round-4 conv-strategy table) — 'auto' now takes v2 wherever valid
# (standard, pair, and tail paths). GDDIM_RESBLOCK_IMPL=v1 restores the
# per-sample body for experiments.
import os as _os

RESBLOCK_IMPL = _os.environ.get("GDDIM_RESBLOCK_IMPL", "auto")

# in-kernel 3x3 conv form for the loop-free (v2) bodies: 'scatter' =
# contiguous wide-N matmuls + shifted VPU adds (_conv9_scatter; production
# default — chip A/B round 4: +8% end-to-end over gather, the padded-tile
# relayout was the 32x32 conv floor), 'gather' = 9 shifted-input matmuls
# from the padded scratch. Tests monkeypatch these module attributes; the
# chip A/B flips the env.
CONV9_IMPL = _os.environ.get("GDDIM_CONV9_IMPL", "scatter")
CONV9_GROUP = int(_os.environ.get("GDDIM_CONV9_GROUP", "3"))
# per-shape tap-group override ("1024:9,1024.384:9,256:3"): keys are n=h*w
# or n.cin (cin-qualified beats plain n — singles and pairs at the same
# resolution have different contraction widths and different optima). The
# best group size trades the wide-N matmul's MXU efficiency against the
# int32 intermediate's VMEM share, which shifts with the level's geometry.


def _parse_shape_map(env: str) -> dict:
    out = {}
    for e in _os.environ.get(env, "").split(","):
        if not e:
            continue
        k, v = e.split(":")
        key = tuple(int(p) for p in k.split(".")) if "." in k else (int(k), None)
        out[key] = int(v)
    return out


# Round-5 battery winners (PERF.md round-5 lever table, end-to-end verdict
# "full combo minus 32x32": 96.8 vs 95.5 img/s for the bare r4 policy in the
# same session): per-shape defaults baked in so production needs no env.
# GDDIM_* map entries still override per key; value 0 drops a default entry
# (restoring the global/auto pick for that shape).
_DEFAULT_CONV9_GROUP_MAP = {(16, 256): 9, (16, 512): 9}  # 4x4 singles+pairs
_DEFAULT_BT_MAP = {(64, 256): 16, (16, 512): 32, (1024, 256): 2}

CONV9_GROUP_MAP = {
    k: v
    for k, v in {
        **_DEFAULT_CONV9_GROUP_MAP,
        **_parse_shape_map("GDDIM_CONV9_GROUP_MAP"),
    }.items()
    if v
}


def _conv9_group_for(n: int, cin: int | None = None) -> int:
    if cin is not None and (n, cin) in CONV9_GROUP_MAP:
        return CONV9_GROUP_MAP[(n, cin)]
    return CONV9_GROUP_MAP.get((n, None), CONV9_GROUP)


# per-shape kernel-body override ("64.512:1,16:1" — value 1=v1, 2=v2), keyed
# like the other maps by n=h*w or n.cin: the v2 tile-vectorized body wins at
# most levels under scatter, but its whole-tile f32 VPU passes can lose to
# v1's per-sample unroll at small-n wide-cin shapes (chip A/B round 5)
RESBLOCK_IMPL_MAP = _parse_shape_map("GDDIM_RESBLOCK_IMPL_MAP")


def _impl_for(n: int, cin: int) -> str:
    v = RESBLOCK_IMPL_MAP.get((n, cin), RESBLOCK_IMPL_MAP.get((n, None)))
    return {1: "v1", 2: "v2"}.get(v, RESBLOCK_IMPL)


def _kernel_body(static_scales: bool, mm_dtype, n: int = 0,
                 cin: int = 0) -> "function":
    v2_ok = static_scales or mm_dtype != jnp.int8
    if _impl_for(n, cin) in ("v2", "auto") and v2_ok:
        return _resblock_kernel_v2
    return _resblock_kernel


def _pick_bt(b, h, w, cin, cout, max_bt: int = 16, work_tiles: int = 2,
             scatter: bool = False) -> int:
    """Largest batch tile fitting the VMEM budget (double-buffered x/out
    blocks + two padded scratch buffers + resident weights + f32 working
    values, with native-tiling padding).

    max_bt: v1's per-sample unroll bounds the tile at 16; the loop-free v2
    body can take larger tiles — the win is M = bt*h*w matmul rows at the
    small-resolution levels (8x8/4x4), whose conv rates are otherwise the
    model's worst. work_tiles: peak count of tile-sized f32 temporaries
    (v2 materializes whole-tile activations, so it budgets one more).
    """

    def pad(n, m):
        return -(-n // m) * m

    def est(bt):
        """Scoped-VMEM estimate for a candidate tile (same model as the
        budget loop below)."""
        x_blk = bt * pad(h * w, 8) * pad(cin, 128) * 2
        o_blk = bt * pad(h * w, 8) * pad(cout, 128) * 2
        if scatter:
            # no padded scratches; instead the wide-N int32 matmul output
            # (group*cout cols) plus the int32 scatter accumulator are live
            g = max(_conv9_group_for(h * w, cin), _conv9_group_for(h * w, cout))
            scr = bt * h * w * ((g + 1) * pad(cout, 128)) * 4
        else:
            scr = bt * (h + 2) * pad(w + 2, 16) * (pad(cin, 128) + pad(cout, 128)) * 2
        work = work_tiles * bt * h * w * max(cin, cout) * 4
        return 2 * x_blk + 2 * o_blk + scr + work

    weights = (9 * (cin * cout + cout * cout) + cin * cout) * 2 + (
        cin * cin + cout * cout
    ) * 4
    # Mosaic's scoped-vmem hard limit is 16 MB; overrides must stay under it
    # (measured: a pair tile estimating ~17.2 MB is rejected at compile).
    HARD = int(15.5 * 2**20)

    bt_env = int(_os.environ.get("GDDIM_RESBLOCK_BT", "0"))  # A/B escape hatch
    if bt_env and b % bt_env == 0:
        return bt_env
    # per-shape override keyed by n=h*w ("1024:4,256:8"): lets one level's
    # tile change without moving the global budget (round 3c showed the
    # 16 MB budget's bt=4-at-32x32 win does not survive globally). Skipped
    # when the forced tile would blow the scoped-vmem hard limit (pairs and
    # tails have wider cin at the same n, so a map entry tuned on singles
    # must not take down the whole model).
    bt_map = _parse_shape_map("GDDIM_RESBLOCK_BT_MAP")
    if scatter:  # the round-5 defaults were tuned under the scatter conv form
        bt_map = {**_DEFAULT_BT_MAP, **bt_map}
    bt_map = {k: v for k, v in bt_map.items() if v}
    if bt_map:
        # cin-qualified key beats plain n (singles vs pairs at one level)
        for key in ((h * w, cin), (h * w, None)):
            bt_s = bt_map.get(key)
            if (
                bt_s
                and b % bt_s == 0
                and est(bt_s) + weights <= HARD
            ):
                return bt_s
            if bt_s:
                break  # matched but over budget: fall through, don't retry n

    # 11 MB measured-best END-TO-END: a 16 MB budget (which flips the 32x32
    # level to bt=4, 19% faster standalone) costs 1.4% on the headline —
    # larger tiles at every level displace the double-buffering headroom the
    # grid pipeline needs. Standalone block timings do not compose; trust
    # the full-model bench (round 3c).
    budget = 11 * 2**20
    for bt in (64, 32, 16, 8, 4, 2, 1):
        if bt > max_bt or b % bt:
            continue
        if est(bt) + weights <= budget:
            return bt
    return 1


def _qs_row(act_scales):
    """(s1, s2, sx|None) scale tuple -> (1, 128) [1/s1, 1/s2, 1/sx, 0...]."""
    s1, s2, sx = act_scales
    vals = [1.0 / s1, 1.0 / s2, (1.0 / sx) if sx is not None else 0.0]
    row = jnp.zeros((1, 128), jnp.float32)
    return row.at[0, : len(vals)].set(jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]))


def fused_resblock(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip=None, b_skip=None, *, num_groups1: int, num_groups2: int,
    eps: float = 1e-6, skip_rescale: bool = True, mm_dtype=None,
    act_scales=None, drop_mask=None, keep_prob: float = 1.0,
):
    """Run one full residual block (see module docstring).

    x: (B, H, W, C); temb_proj: (B, Cout) — the Dense(temb) row, computed
    outside (it is per-sample, tiny, and XLA fuses it with the time MLP);
    w1: (3,3,C,Cout); w2: (3,3,Cout,Cout); w_skip: (C, Cout) for the
    conv1x1/NIN shortcut when C != Cout (else identity skip).

    act_scales (int8 only): calibrated (s1, s2, sx) static activation scales
    (see act_scales_from_amax) — skips the per-sample amax reductions.

    drop_mask (training): (B, H, W, Cout) int8 {0,1} dropout mask applied
    after GN2+SiLU as mask/keep_prob (the nn.Dropout semantics); see
    fused_resblock_train for the differentiable wrapper.
    """
    mm_dtype = mm_dtype or MM_DTYPE
    int8 = mm_dtype == jnp.int8
    static = bool(int8 and act_scales is not None)
    b, h, w_, c = x.shape
    cout = w1.shape[-1]
    has_skip = w_skip is not None
    has_mask = drop_mask is not None
    if not has_skip:
        assert c == cout, (c, cout)
    body = _kernel_body(static, mm_dtype, n=h * w_, cin=c)
    v2 = body is _resblock_kernel_v2
    scatter = v2 and CONV9_IMPL == "scatter"
    bt = _pick_bt(
        b, h, w_, c, cout, max_bt=64 if v2 else 16,
        work_tiles=(3 if v2 else 2) + (1 if has_mask else 0),
        scatter=scatter,
    )

    def prep_w(wm, shape, quant=None):
        """-> (kernel operand, (1,Cout) scale row) for the mm dtype."""
        quant = int8 if quant is None else quant
        wm = jnp.asarray(wm, jnp.float32).reshape(shape)
        if not quant:
            dt = jnp.bfloat16 if (int8 or mm_dtype == jnp.bfloat16) else wm.dtype
            return wm.astype(dt), jnp.ones((1, shape[-1]), jnp.float32)
        axes = tuple(range(wm.ndim - 1))
        sc = jnp.maximum(jnp.abs(wm).max(axis=axes), 1e-12) / 127.0
        q = jnp.clip(jnp.round(wm / sc), -127, 127).astype(jnp.int8)
        return q, sc.reshape(1, -1)
    inv_n1 = 1.0 / (h * w_ * (c // num_groups1))
    inv_n2 = 1.0 / (h * w_ * (cout // num_groups2))
    static_skip = bool(static and act_scales[2] is not None)
    kernel = functools.partial(
        body,
        bt=bt, h=h, w=w_, cin=c, cout=cout, inv_n1=inv_n1, inv_n2=inv_n2,
        eps=eps, has_skip=has_skip, rescale=skip_rescale, mm_dtype=mm_dtype,
        static_scales=static, static_skip=static_skip,
        has_mask=has_mask, inv_keep=1.0 / keep_prob,
        conv_impl="scatter" if scatter else "gather",
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    w1_op, w1_sc = prep_w(w1, (9, c, cout))
    w2_op, w2_sc = prep_w(w2, (9, cout, cout))
    if scatter:
        w1_op, w2_op = _pack_w_scatter(w1_op), _pack_w_scatter(w2_op)
    # dynamic-skip int8 mode runs the 1x1 projection bf16 (see the kernel)
    wsk_op, wsk_sc = prep_w(
        w_skip if has_skip else np.zeros((c, cout), np.float32), (c, cout),
        quant=int8 and static_skip,
    )
    if static:
        s1, s2, sx = act_scales
        w1_sc = w1_sc * s1
        w2_sc = w2_sc * s2
        if has_skip and static_skip:
            wsk_sc = wsk_sc * sx
    temb_b = jnp.broadcast_to(
        jnp.asarray(temb_proj, jnp.float32)[:, None, :], (b, 8, cout)
    )
    args = [
        x.reshape(b, h * w_, c),
        temb_b,
        row(gn1_scale), row(gn1_bias), _group_indicator(c, num_groups1),
        w1_op, row(b1), w1_sc,
        row(gn2_scale), row(gn2_bias), _group_indicator(cout, num_groups2),
        w2_op, row(b2), w2_sc,
        wsk_op,
        (row(b_skip) if b_skip is not None else jnp.zeros((1, cout), jnp.float32)),
        wsk_sc,
    ]
    if static:
        args.append(_qs_row(act_scales))
    if has_mask:
        args.append(jnp.asarray(drop_mask, jnp.int8).reshape(b, h * w_, cout))
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h * w_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # temb rows, pre-broadcast to an (8, Cout)-tileable layout
            const((1, c)), const((1, c)), const((c, c)),
            const(w1_op.shape), const((1, cout)), const((1, cout)),
            const((1, cout)), const((1, cout)), const((cout, cout)),
            const(w2_op.shape), const((1, cout)), const((1, cout)),
            const((c, cout)), const((1, cout)), const((1, cout)),
        ] + ([const((1, 128))] if static else []) + ([
            pl.BlockSpec(
                (bt, h * w_, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ] if has_mask else []),
        out_specs=pl.BlockSpec(
            (bt, h * w_, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w_, cout), x.dtype),
        scratch_shapes=(
            # scatter never touches the padded scratches: minimal dummies
            [pltpu.VMEM((8, 128), mm_dtype), pltpu.VMEM((8, 128), mm_dtype)]
            if scatter else
            [
                pltpu.VMEM((bt, h + 2, w_ + 2, c), mm_dtype),
                pltpu.VMEM((bt, h + 2, w_ + 2, cout), mm_dtype),
            ]
        ),  # int8 scratches halve again vs bf16
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_ * 9 * (c * cout + cout * cout),
            bytes_accessed=b * h * w_ * (c + cout) * x.dtype.itemsize,
            transcendentals=2 * b * h * w_ * (c + cout),
        ),
    )(*args)
    return out.reshape(b, h, w_, cout)


def _resblock_pair_kernel(
    xa_ref, xb_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1_ref, b1_ref,
    w1sc_ref, gn2s_ref, gn2b_ref, p2_ref, w2_ref, b2_ref, w2sc_ref,
    wskip_ref, bskip_ref, wsksc_ref, *rest,
    bt, h, w, c1, c2, cout, inv_n1, inv_n2, eps, rescale, mm_dtype,
    static_scales=False, static_skip=True, conv_impl="gather",
):
    """Two-input variant of _resblock_kernel for the U-Net up path: the block
    input is logically concat(xa, xb) along channels, but concatenating
    before a pallas_call materializes ~2x the activation in HBM (the call is
    a fusion barrier). Here the two refs are read directly; GN1 statistics
    assemble from per-part row sums, conv1 consumes the two halves of the
    padded buffer, and the skip projection runs as two matmuls against the
    row-split w_skip. The skip is always projected (up-path C > C_out).
    """
    assert conv_impl == "gather", "v1 (per-sample amax) supports gather only"
    rest = list(rest)
    qs_ref = rest.pop(0) if static_scales else None
    o_ref, hpad_ref, hpad2_ref = rest
    int8 = mm_dtype == jnp.int8
    n = h * w
    cin = c1 + c2

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        hpad_ref[...] = jnp.zeros_like(hpad_ref)
        hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    # --- GN1 + SiLU over the logical concat, per sample --------------------
    s1s = []
    for s in range(bt):
        xa = xa_ref[s].astype(jnp.float32)  # (n, c1)
        xb = xb_ref[s].astype(jnp.float32)  # (n, c2)
        s_row = jnp.concatenate(
            [jnp.sum(xa, 0, keepdims=True), jnp.sum(xb, 0, keepdims=True)], 1
        )
        sq_row = jnp.concatenate(
            [jnp.sum(xa * xa, 0, keepdims=True), jnp.sum(xb * xb, 0, keepdims=True)], 1
        )
        mean = jax.lax.dot(s_row, p1_ref[...], preferred_element_type=jnp.float32) * inv_n1
        esq = jax.lax.dot(sq_row, p1_ref[...], preferred_element_type=jnp.float32) * inv_n1
        rstd = jax.lax.rsqrt(esq - mean * mean + eps)
        oa = (xa - mean[:, :c1]) * rstd[:, :c1] * gn1s_ref[0, :c1] + gn1b_ref[0, :c1]
        ob = (xb - mean[:, c1:]) * rstd[:, c1:] * gn1s_ref[0, c1:] + gn1b_ref[0, c1:]
        oa = oa * jax.nn.sigmoid(oa)
        ob = ob * jax.nn.sigmoid(ob)
        if int8:
            if static_scales:
                inv_s1 = qs_ref[0, 0]
            else:
                amax = jnp.maximum(
                    jnp.max(jnp.abs(oa)), jnp.maximum(jnp.max(jnp.abs(ob)), 1e-12)
                )
                s1s.append(amax / 127.0)
                inv_s1 = 127.0 / amax
            oa = jnp.clip(jnp.round(oa * inv_s1), -127, 127).astype(jnp.int8)
            ob = jnp.clip(jnp.round(ob * inv_s1), -127, 127).astype(jnp.int8)
        hpad_ref[s, 1 : h + 1, 1 : w + 1, :c1] = oa.reshape(h, w, c1).astype(hpad_ref.dtype)
        hpad_ref[s, 1 : h + 1, 1 : w + 1, c1:] = ob.reshape(h, w, c2).astype(hpad_ref.dtype)

    # --- conv1 (batched) + bias + temb, GN2 + SiLU per sample --------------
    acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    s2s = []
    for s in range(bt):
        acc_s = acc[s * n : (s + 1) * n].astype(jnp.float32)
        if int8:
            acc_s = acc_s * (w1sc_ref[0] if static_scales else s1s[s] * w1sc_ref[0])
        acc_s = acc_s + b1_ref[0] + temb_ref[s, 0:1, :]
        a2 = _gn_silu_2d(acc_s, p2_ref[...], gn2s_ref[0], gn2b_ref[0], inv_n2, eps)
        if int8:
            if static_scales:
                a2 = _quant_2d_static(a2, qs_ref[0, 1])
            else:
                a2, sc2 = _quant_2d(a2)
                s2s.append(sc2)
        hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a2.reshape(h, w, cout).astype(
            hpad2_ref.dtype
        )

    # --- conv2 (batched) + epilogue: bias + split skip + residual ----------
    acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    for s in range(bt):
        h_s = acc2[s * n : (s + 1) * n].astype(jnp.float32)
        if int8:
            h_s = h_s * (w2sc_ref[0] if static_scales else s2s[s] * w2sc_ref[0])
        h_s = h_s + b2_ref[0]
        xa = xa_ref[s].astype(jnp.float32)
        xb = xb_ref[s].astype(jnp.float32)
        # see _resblock_kernel: static int8 at the (pre-norm) skip site is
        # opt-in; otherwise run the 1x1 projection bf16 — cheaper than a
        # whole-tile amax+quant pass for ~1/18 of the block's FLOPs
        if int8 and static_scales and static_skip:
            inv_sx = qs_ref[0, 2]
            qa = jnp.clip(jnp.round(xa * inv_sx), -127, 127).astype(jnp.int8)
            qb = jnp.clip(jnp.round(xb * inv_sx), -127, 127).astype(jnp.int8)
            sk = jax.lax.dot_general(
                qa, wskip_ref[:c1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                qb, wskip_ref[c1:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            skip = sk.astype(jnp.float32) * wsksc_ref[0] + bskip_ref[0]
        else:
            wdt = jnp.bfloat16 if int8 else mm_dtype
            skip = jax.lax.dot_general(
                xa.astype(wdt), wskip_ref[:c1].astype(wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                xb.astype(wdt), wskip_ref[c1:].astype(wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bskip_ref[0]
        out = skip + h_s
        if rescale:
            out = out * _INV_SQRT2
        o_ref[s] = out.astype(o_ref.dtype)


def _resblock_pair_kernel_v2(
    xa_ref, xb_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1_ref, b1_ref,
    w1sc_ref, gn2s_ref, gn2b_ref, p2_ref, w2_ref, b2_ref, w2sc_ref,
    wskip_ref, bskip_ref, wsksc_ref, *rest,
    bt, h, w, c1, c2, cout, inv_n1, inv_n2, eps, rescale, mm_dtype,
    static_scales=False, static_skip=True, conv_impl="gather",
):
    """Loop-free variant of _resblock_pair_kernel (static-scale int8 / bf16
    modes; see _resblock_kernel_v2). GN1 statistics assemble from per-part
    tile reductions; everything per-sample becomes a (bt, n, C) broadcast.

    conv_impl='scatter': conv1 runs _conv9_scatter on the two parts as a
    K-split pair of matmuls — even the padded-scratch concat disappears."""
    rest = list(rest)
    qs_ref = rest.pop(0) if static_scales else None
    o_ref, hpad_ref, hpad2_ref = rest
    int8 = mm_dtype == jnp.int8
    n = h * w
    cin = c1 + c2
    scatter = conv_impl == "scatter"

    if not scatter:

        @pl.when(pl.program_id(0) == 0)
        def _zero_borders():
            hpad_ref[...] = jnp.zeros_like(hpad_ref)
            hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    # --- GN1 + SiLU over the logical concat, tile-vectorized ---------------
    xa3 = xa_ref[...].astype(jnp.float32)  # (bt, n, c1)
    xb3 = xb_ref[...].astype(jnp.float32)  # (bt, n, c2)
    s_bt = jnp.concatenate([jnp.sum(xa3, 1), jnp.sum(xb3, 1)], axis=1)
    sq_bt = jnp.concatenate(
        [jnp.sum(xa3 * xa3, 1), jnp.sum(xb3 * xb3, 1)], axis=1
    )
    mean = jax.lax.dot(s_bt, p1_ref[...], preferred_element_type=jnp.float32) * inv_n1
    esq = jax.lax.dot(sq_bt, p1_ref[...], preferred_element_type=jnp.float32) * inv_n1
    a_aff = jax.lax.rsqrt(esq - mean * mean + eps) * gn1s_ref[...]  # (bt, cin)
    b_aff = gn1b_ref[...] - mean * a_aff
    # slice BEFORE the None-expansion: a mixed [:, None, :c1] index lowers to
    # a gather, which Mosaic's TPU lowering rejects
    oa = xa3 * a_aff[:, :c1][:, None, :] + b_aff[:, :c1][:, None, :]
    ob = xb3 * a_aff[:, c1:][:, None, :] + b_aff[:, c1:][:, None, :]
    oa = oa * jax.nn.sigmoid(oa)
    ob = ob * jax.nn.sigmoid(ob)
    if int8:
        oa = jnp.clip(jnp.round(oa * qs_ref[0, 0]), -127, 127).astype(jnp.int8)
        ob = jnp.clip(jnp.round(ob * qs_ref[0, 0]), -127, 127).astype(jnp.int8)

    # --- conv1 (batched) + bias + temb + GN2 + SiLU (+quant) ---------------
    if scatter:
        acc = _conv9_scatter(
            [oa.reshape(bt * n, c1).astype(mm_dtype),
             ob.reshape(bt * n, c2).astype(mm_dtype)],
            w1_ref, bt, h, w, cout, mm_dtype,
        )
    else:
        for s in range(bt):
            hpad_ref[s, 1 : h + 1, 1 : w + 1, :c1] = oa[s].reshape(
                h, w, c1
            ).astype(hpad_ref.dtype)
            hpad_ref[s, 1 : h + 1, 1 : w + 1, c1:] = ob[s].reshape(
                h, w, c2
            ).astype(hpad_ref.dtype)
        acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    acc3 = acc.reshape(bt, n, cout).astype(jnp.float32)
    if int8:
        acc3 = acc3 * w1sc_ref[...][None]
    acc3 = acc3 + b1_ref[...][None] + temb_ref[:, 0:1, :]
    s2 = jnp.sum(acc3, axis=1)
    sq2 = jnp.sum(acc3 * acc3, axis=1)
    mean2 = jax.lax.dot(s2, p2_ref[...], preferred_element_type=jnp.float32) * inv_n2
    esq2 = jax.lax.dot(sq2, p2_ref[...], preferred_element_type=jnp.float32) * inv_n2
    a2_aff = jax.lax.rsqrt(esq2 - mean2 * mean2 + eps) * gn2s_ref[...]
    b2_aff = gn2b_ref[...] - mean2 * a2_aff
    a2 = acc3 * a2_aff[:, None, :] + b2_aff[:, None, :]
    a2 = a2 * jax.nn.sigmoid(a2)
    if int8:
        a2 = jnp.clip(jnp.round(a2 * qs_ref[0, 1]), -127, 127).astype(jnp.int8)

    # --- conv2 (batched) + epilogue + split skip (batched) -----------------
    if scatter:
        acc2 = _conv9_scatter(
            [a2.reshape(bt * n, cout).astype(mm_dtype)],
            w2_ref, bt, h, w, cout, mm_dtype,
        )
    else:
        for s in range(bt):
            hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a2[s].reshape(
                h, w, cout
            ).astype(hpad2_ref.dtype)
        acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    h3 = acc2.reshape(bt, n, cout).astype(jnp.float32)
    if int8:
        h3 = h3 * w2sc_ref[...][None]
    h3 = h3 + b2_ref[...][None]
    xa2 = xa3.reshape(bt * n, c1)
    xb2 = xb3.reshape(bt * n, c2)
    if int8 and static_scales and static_skip:
        qa = jnp.clip(jnp.round(xa2 * qs_ref[0, 2]), -127, 127).astype(jnp.int8)
        qb = jnp.clip(jnp.round(xb2 * qs_ref[0, 2]), -127, 127).astype(jnp.int8)
        sk = jax.lax.dot_general(
            qa, wskip_ref[:c1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + jax.lax.dot_general(
            qb, wskip_ref[c1:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        skip = sk.astype(jnp.float32) * wsksc_ref[...]
    else:
        wdt = jnp.bfloat16 if int8 else mm_dtype
        skip = jax.lax.dot_general(
            xa2.astype(wdt), wskip_ref[:c1].astype(wdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xb2.astype(wdt), wskip_ref[c1:].astype(wdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = skip.reshape(bt, n, cout) + bskip_ref[...][None] + h3
    if rescale:
        out = out * _INV_SQRT2
    o_ref[...] = out.astype(o_ref.dtype)


def _pair_body(static_scales: bool, mm_dtype, n: int = 0, cin: int = 0):
    if _impl_for(n, cin) in ("v2", "auto") and (
        static_scales or mm_dtype != jnp.int8
    ):
        return _resblock_pair_kernel_v2
    return _resblock_pair_kernel


def fused_resblock_pair(
    xa, xb, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
    w2, b2, w_skip, b_skip, *, num_groups1: int, num_groups2: int,
    eps: float = 1e-6, skip_rescale: bool = True, mm_dtype=None,
    act_scales=None,
):
    """fused_resblock on a logical concat(xa, xb) input without materializing
    the concat in HBM (see _resblock_pair_kernel). w_skip: (c1+c2, Cout)."""
    mm_dtype = mm_dtype or MM_DTYPE
    int8 = mm_dtype == jnp.int8
    static = bool(int8 and act_scales is not None)
    b, h, w_, c1 = xa.shape
    c2 = xb.shape[-1]
    assert xb.shape == (b, h, w_, c2)
    cin = c1 + c2
    cout = w1.shape[-1]
    body = _pair_body(static, mm_dtype, n=h * w_, cin=cin)
    v2 = body is _resblock_pair_kernel_v2
    scatter = v2 and CONV9_IMPL == "scatter"
    bt = _pick_bt(
        b, h, w_, cin, cout, max_bt=64 if v2 else 16,
        work_tiles=3 if v2 else 2, scatter=scatter,
    )

    def prep_w(wm, shape, quant=None):
        quant = int8 if quant is None else quant
        wm = jnp.asarray(wm, jnp.float32).reshape(shape)
        if not quant:
            dt = jnp.bfloat16 if (int8 or mm_dtype == jnp.bfloat16) else wm.dtype
            return wm.astype(dt), jnp.ones((1, shape[-1]), jnp.float32)
        axes = tuple(range(wm.ndim - 1))
        sc = jnp.maximum(jnp.abs(wm).max(axis=axes), 1e-12) / 127.0
        q = jnp.clip(jnp.round(wm / sc), -127, 127).astype(jnp.int8)
        return q, sc.reshape(1, -1)

    inv_n1 = 1.0 / (h * w_ * (cin // num_groups1))
    inv_n2 = 1.0 / (h * w_ * (cout // num_groups2))
    static_skip = bool(static and act_scales[2] is not None)
    kernel = functools.partial(
        body,
        bt=bt, h=h, w=w_, c1=c1, c2=c2, cout=cout, inv_n1=inv_n1,
        inv_n2=inv_n2, eps=eps, rescale=skip_rescale, mm_dtype=mm_dtype,
        static_scales=static, static_skip=static_skip,
        conv_impl="scatter" if scatter else "gather",
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    w1_op, w1_sc = prep_w(w1, (9, cin, cout))
    w2_op, w2_sc = prep_w(w2, (9, cout, cout))
    if scatter:
        w1_op, w2_op = _pack_w_scatter(w1_op), _pack_w_scatter(w2_op)
    # dynamic-skip int8 mode runs the 1x1 projection bf16 (see the kernel)
    wsk_op, wsk_sc = prep_w(w_skip, (cin, cout), quant=int8 and static_skip)
    if static:
        s1, s2, sx = act_scales
        w1_sc = w1_sc * s1
        w2_sc = w2_sc * s2
        if static_skip:
            wsk_sc = wsk_sc * sx
    temb_b = jnp.broadcast_to(
        jnp.asarray(temb_proj, jnp.float32)[:, None, :], (b, 8, cout)
    )
    args = [
        xa.reshape(b, h * w_, c1),
        xb.reshape(b, h * w_, c2),
        temb_b,
        row(gn1_scale), row(gn1_bias), _group_indicator(cin, num_groups1),
        w1_op, row(b1), w1_sc,
        row(gn2_scale), row(gn2_bias), _group_indicator(cout, num_groups2),
        w2_op, row(b2), w2_sc,
        wsk_op,
        (row(b_skip) if b_skip is not None else jnp.zeros((1, cout), jnp.float32)),
        wsk_sc,
    ]
    if static:
        args.append(_qs_row(act_scales))
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h * w_, c1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, h * w_, c2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            const((1, cin)), const((1, cin)), const((cin, cin)),
            const(w1_op.shape), const((1, cout)), const((1, cout)),
            const((1, cout)), const((1, cout)), const((cout, cout)),
            const(w2_op.shape), const((1, cout)), const((1, cout)),
            const((cin, cout)), const((1, cout)), const((1, cout)),
        ] + ([const((1, 128))] if static else []),
        out_specs=pl.BlockSpec(
            (bt, h * w_, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w_, cout), xa.dtype),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), mm_dtype), pltpu.VMEM((8, 128), mm_dtype)]
            if scatter else
            [
                pltpu.VMEM((bt, h + 2, w_ + 2, cin), mm_dtype),
                pltpu.VMEM((bt, h + 2, w_ + 2, cout), mm_dtype),
            ]
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_ * 9 * (cin * cout + cout * cout),
            bytes_accessed=b * h * w_ * (cin + cout) * xa.dtype.itemsize,
            transcendentals=2 * b * h * w_ * (cin + cout),
        ),
    )(*args)
    return out.reshape(b, h, w_, cout)


def fused_resblock_tail(
    h, x_skip, temb_proj, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, *, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True, mm_dtype=None, act_scales=None,
):
    """Fused core for up/down transition blocks (reference layerspp.py:180-227).

    GN1+SiLU and the FIR resample run OUTSIDE (they need the pre-resample
    resolution); this kernel runs the remainder — conv1+bias+temb -> GN2+SiLU
    -> conv2+bias -> conv1x1(x_skip) + residual — with the tile in VMEM.

    h: (B, H, W, C) = silu(GN1(x)) after resampling; x_skip: (B, H, W, C)
    the resampled residual input; w_skip: (C, Cout) REQUIRED (transition
    blocks always project the shortcut). act_scales: see fused_resblock.
    """
    mm_dtype = mm_dtype or MM_DTYPE
    int8 = mm_dtype == jnp.int8
    static = bool(int8 and act_scales is not None)
    b, hh, ww, c = h.shape
    cout = w1.shape[-1]
    assert x_skip.shape == (b, hh, ww, c), (x_skip.shape, h.shape)
    body = _kernel_body(static, mm_dtype, n=hh * ww, cin=c)
    v2 = body is _resblock_kernel_v2
    scatter = v2 and CONV9_IMPL == "scatter"
    bt = _pick_bt(
        b, hh, ww, c, cout, max_bt=64 if v2 else 16,
        work_tiles=3 if v2 else 2, scatter=scatter,
    )

    def prep_w(wm, shape, quant=None):
        quant = int8 if quant is None else quant
        wm = jnp.asarray(wm, jnp.float32).reshape(shape)
        if not quant:
            dt = jnp.bfloat16 if (int8 or mm_dtype == jnp.bfloat16) else wm.dtype
            return wm.astype(dt), jnp.ones((1, shape[-1]), jnp.float32)
        axes = tuple(range(wm.ndim - 1))
        sc = jnp.maximum(jnp.abs(wm).max(axis=axes), 1e-12) / 127.0
        q = jnp.clip(jnp.round(wm / sc), -127, 127).astype(jnp.int8)
        return q, sc.reshape(1, -1)

    inv_n2 = 1.0 / (hh * ww * (cout // num_groups2))
    static_skip = bool(static and act_scales[2] is not None)
    kernel = functools.partial(
        body,
        bt=bt, h=hh, w=ww, cin=c, cout=cout, inv_n1=1.0, inv_n2=inv_n2,
        eps=eps, has_skip=True, rescale=skip_rescale, mm_dtype=mm_dtype,
        apply_gn1=False, separate_skip=True, static_scales=static,
        static_skip=static_skip,
        conv_impl="scatter" if scatter else "gather",
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    w1_op, w1_sc = prep_w(w1, (9, c, cout))
    w2_op, w2_sc = prep_w(w2, (9, cout, cout))
    if scatter:
        w1_op, w2_op = _pack_w_scatter(w1_op), _pack_w_scatter(w2_op)
    # dynamic-skip int8 mode runs the 1x1 projection bf16 (see the kernel)
    wsk_op, wsk_sc = prep_w(w_skip, (c, cout), quant=int8 and static_skip)
    if static:
        s1, s2, sx = act_scales
        w1_sc = w1_sc * s1
        w2_sc = w2_sc * s2
        if static_skip:
            wsk_sc = wsk_sc * sx
    temb_b = jnp.broadcast_to(
        jnp.asarray(temb_proj, jnp.float32)[:, None, :], (b, 8, cout)
    )
    ones_c = jnp.ones((1, c), jnp.float32)
    args = [
        h.reshape(b, hh * ww, c),
        temb_b,
        ones_c, ones_c, _group_indicator(c, 1),  # unused GN1 params (tail mode)
        w1_op, row(b1), w1_sc,
        row(gn2_scale), row(gn2_bias), _group_indicator(cout, num_groups2),
        w2_op, row(b2), w2_sc,
        wsk_op,
        (row(b_skip) if b_skip is not None else jnp.zeros((1, cout), jnp.float32)),
        wsk_sc,
        x_skip.reshape(b, hh * ww, c),
    ]
    if static:
        args.append(_qs_row(act_scales))
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, hh * ww, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            const((1, c)), const((1, c)), const((c, c)),
            const(w1_op.shape), const((1, cout)), const((1, cout)),
            const((1, cout)), const((1, cout)), const((cout, cout)),
            const(w2_op.shape), const((1, cout)), const((1, cout)),
            const((c, cout)), const((1, cout)), const((1, cout)),
            pl.BlockSpec(
                (bt, hh * ww, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ] + ([const((1, 128))] if static else []),
        out_specs=pl.BlockSpec(
            (bt, hh * ww, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh * ww, cout), h.dtype),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), mm_dtype), pltpu.VMEM((8, 128), mm_dtype)]
            if scatter else
            [
                pltpu.VMEM((bt, hh + 2, ww + 2, c), mm_dtype),
                pltpu.VMEM((bt, hh + 2, ww + 2, cout), mm_dtype),
            ]
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hh * ww * 9 * (c * cout + cout * cout),
            bytes_accessed=b * hh * ww * (2 * c + cout) * h.dtype.itemsize,
            transcendentals=b * hh * ww * cout,
        ),
    )(*args)
    return out.reshape(b, hh, ww, cout)


def _fir_up_2d(r0, r1, r2, h, w, c, kern_h, kern_w):
    """r0/r1/r2: (h, (w+2)*c) row windows [0:h],[1:h+1],[2:h+2] of the padded
    sample -> (4*h*w, c): factor-2 FIR upsample.

    Polyphase form of the zero-insert+filter pipeline (models/resample.py):
    out[2j] = kh0*x[j-1] + kh2*x[j]; out[2j+1] = kh1*x[j] + kh3*x[j+1],
    per axis. kern_h carries the H-axis gain (gain*factor^2), kern_w is the
    plain flipped taps. The three row windows must be loaded SEPARATELY from
    the ref: a value slice at an odd sublane offset carries a {1,0} layout
    that Mosaic's concatenate rejects, while fresh ref loads are canonically
    laid out (validated on-chip, scripts/exp_fir_inkernel). The phase
    interleave is a lane-dim concatenate + a minor-splitting rank-2 reshape
    (row-major identity) — no strided slices, no gathers.
    """
    e = kern_h[0] * r0 + kern_h[2] * r1
    o = kern_h[1] * r1 + kern_h[3] * r2
    wp = r0.shape[1]  # (w+2)*c
    u = jnp.concatenate([e, o], axis=1).reshape(2 * h, wp)
    ew = kern_w[0] * u[:, 0 : w * c] + kern_w[2] * u[:, c : (w + 1) * c]
    ow = kern_w[1] * u[:, c : (w + 1) * c] + kern_w[3] * u[:, 2 * c : (w + 2) * c]
    cat = jnp.concatenate(
        [ew.reshape(2 * h * w, c), ow.reshape(2 * h * w, c)], axis=1
    )
    return cat.reshape(4 * h * w, c)


def _fir_down_2d(p2, h, w, c, kern_h, kern_w):
    """(h+2, (w+2)*c) padded sample -> (h//2 * w//2, c): factor-2 FIR down.

    out[o] = sum_a kern[a] * x[2o + a - 1] per axis (4 taps, stride 2).
    Phase de-interleave = minor-splitting reshape + 128-aligned lane slices.
    """
    wp = p2.shape[1]
    a01 = p2[0:h, :].reshape(h // 2, 2 * wp)
    a23 = p2[2 : h + 2, :].reshape(h // 2, 2 * wp)
    t = (
        kern_h[0] * a01[:, :wp]
        + kern_h[1] * a01[:, wp:]
        + kern_h[2] * a23[:, :wp]
        + kern_h[3] * a23[:, wp:]
    )  # (h/2, (w+2)c): H done, W still padded
    tp = t.reshape(h // 2 * (w + 2) // 2, 2 * c)
    ev = tp[:, :c].reshape(h // 2, (w + 2) // 2 * c)
    od = tp[:, c:].reshape(h // 2, (w + 2) // 2 * c)
    y = (
        kern_w[0] * ev[:, 0 : w // 2 * c]
        + kern_w[1] * od[:, 0 : w // 2 * c]
        + kern_w[2] * ev[:, c : c + w // 2 * c]
        + kern_w[3] * od[:, c : c + w // 2 * c]
    )
    return y.reshape(h // 2 * w // 2, c)


def _transition_kerns(up: bool, fir: bool, fir_kernel) -> tuple:
    """-> (kern_h, kern_w) 4-float phase coefficients for the in-kernel
    resample, reproducing models/resample semantics exactly:
    upsample_2d/downsample_2d for fir, naive_{up,down}sample_2d otherwise."""
    if fir:
        k1d = np.asarray(fir_kernel, np.float64)
        k1d = (k1d / k1d.sum())[::-1]  # reference convolves the flipped taps
        assert k1d.shape[0] == 4, "transition kernel supports 4-tap FIR"
        kw = tuple(float(v) for v in k1d)
        kh = tuple(4.0 * v for v in k1d) if up else kw  # H carries the gain
        return kh, kw
    if up:  # nearest: out[2j] = out[2j+1] = x[j]
        return (0.0, 1.0, 1.0, 0.0), (0.0, 1.0, 1.0, 0.0)
    return (0.0, 0.5, 0.5, 0.0), (0.0, 0.5, 0.5, 0.0)  # 2x2 mean


def _resblock_transition_kernel(
    x_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1_ref, b1_ref, w1sc_ref,
    gn2s_ref, gn2b_ref, p2_ref, w2_ref, b2_ref, w2sc_ref,
    wskip_ref, bskip_ref, wsksc_ref, *rest,
    bt, h_in, w_in, h, w, cin, cout, inv_n1, inv_n2, eps, rescale, mm_dtype,
    up, kern_h, kern_w, static_scales=False, static_skip=True,
):
    """Whole up/down transition block in one kernel (one HBM read of x, one
    write of out): GN1+SiLU at the input resolution -> in-kernel factor-2
    resample of BOTH the activation and the raw residual -> conv1+bias+temb
    -> GN2+SiLU -> conv2+bias -> conv1x1 skip + residual.

    Replaces the round-3 tail path (norm_act + two XLA FIR passes + tail
    kernel), which cost 4 extra HBM passes over the post-resample-size
    tensors per transition block. pad_in_ref (input-res padded scratch,
    model dtype) is shared between the two resample sites: stage 1 fills it
    with silu(GN1(x)), stage 3 refills it with raw x for the skip.
    """
    rest = list(rest)
    qs_ref = rest.pop(0) if static_scales else None
    o_ref, pad_in_ref, hpad_ref, hpad2_ref = rest
    int8 = mm_dtype == jnp.int8
    n_out = h * w
    wpc = (w_in + 2) * cin

    def fir2(s):
        """Resample pad_in_ref[s] (input-res padded scratch) -> (h*w, cin).

        Up loads its three row windows as separate ref loads (Mosaic layout
        requirement, see _fir_up_2d); down reads the whole padded sample.
        """
        if up:
            r0 = pad_in_ref[s, 0:h_in].reshape(h_in, wpc).astype(jnp.float32)
            r1 = pad_in_ref[s, 1 : h_in + 1].reshape(h_in, wpc).astype(jnp.float32)
            r2 = pad_in_ref[s, 2 : h_in + 2].reshape(h_in, wpc).astype(jnp.float32)
            return _fir_up_2d(r0, r1, r2, h_in, w_in, cin, kern_h, kern_w)
        p2 = pad_in_ref[s].reshape(h_in + 2, wpc).astype(jnp.float32)
        return _fir_down_2d(p2, h_in, w_in, cin, kern_h, kern_w)

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        pad_in_ref[...] = jnp.zeros_like(pad_in_ref)
        hpad_ref[...] = jnp.zeros_like(hpad_ref)
        hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    # --- GN1 + SiLU at input res, resample, quantize, per sample -----------
    s1s = []
    for s in range(bt):
        a1 = _gn_silu_2d(
            x_ref[s].astype(jnp.float32), p1_ref[...], gn1s_ref[0],
            gn1b_ref[0], inv_n1, eps,
        )
        pad_in_ref[s, 1 : h_in + 1, 1 : w_in + 1, :] = a1.reshape(
            h_in, w_in, cin
        ).astype(pad_in_ref.dtype)
        hr = fir2(s)  # (n_out, cin)
        if int8:
            if static_scales:
                hr = _quant_2d_static(hr, qs_ref[0, 0])
            else:
                hr, sc = _quant_2d(hr)
                s1s.append(sc)
        hpad_ref[s, 1 : h + 1, 1 : w + 1, :] = hr.reshape(h, w, cin).astype(
            hpad_ref.dtype
        )

    # --- conv1 (batched) + bias + temb, then GN2 + SiLU per sample ---------
    acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    s2s = []
    for s in range(bt):
        acc_s = acc[s * n_out : (s + 1) * n_out].astype(jnp.float32)
        if int8:
            acc_s = acc_s * (w1sc_ref[0] if static_scales else s1s[s] * w1sc_ref[0])
        acc_s = acc_s + b1_ref[0] + temb_ref[s, 0:1, :]
        a2 = _gn_silu_2d(
            acc_s, p2_ref[...], gn2s_ref[0], gn2b_ref[0], inv_n2, eps
        )
        if int8:
            if static_scales:
                a2 = _quant_2d_static(a2, qs_ref[0, 1])
            else:
                a2, sc2 = _quant_2d(a2)
                s2s.append(sc2)
        hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a2.reshape(h, w, cout).astype(
            hpad2_ref.dtype
        )

    # --- conv2 (batched) + per-sample epilogue: resampled skip + residual --
    acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    for s in range(bt):
        h_s = acc2[s * n_out : (s + 1) * n_out].astype(jnp.float32)
        if int8:
            h_s = h_s * (w2sc_ref[0] if static_scales else s2s[s] * w2sc_ref[0])
        h_s = h_s + b2_ref[0]
        # refill the shared input-res scratch with RAW x and resample it for
        # the shortcut (borders still zero: interior-only writes)
        pad_in_ref[s, 1 : h_in + 1, 1 : w_in + 1, :] = (
            x_ref[s].reshape(h_in, w_in, cin).astype(pad_in_ref.dtype)
        )
        x_rs = fir2(s)  # (n_out, cin)
        if int8 and static_scales and static_skip:
            xq = _quant_2d_static(x_rs, qs_ref[0, 2])
            skip = jax.lax.dot_general(
                xq, wskip_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * wsksc_ref[0] + bskip_ref[0]
        else:
            wdt = jnp.bfloat16 if int8 else mm_dtype
            skip = jax.lax.dot_general(
                x_rs.astype(wdt), wskip_ref[...].astype(wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bskip_ref[0]
        out = skip + h_s
        if rescale:
            out = out * _INV_SQRT2
        o_ref[s] = out.astype(o_ref.dtype)


def _pick_bt_transition(b, h_in, w_in, cin, cout, up: bool) -> int:
    """VMEM-budgeted batch tile for the transition kernel: x block at input
    res, out block + conv scratches at output res, one shared input-res
    padded scratch, resident weights, and f32 working tiles at the larger
    of the two resolutions."""

    def pad(n, m):
        return -(-n // m) * m

    h, w = (2 * h_in, 2 * w_in) if up else (h_in // 2, w_in // 2)
    n_big = max(h_in * w_in, h * w)

    def est(bt):
        x_blk = bt * pad(h_in * w_in, 8) * pad(cin, 128) * 2
        o_blk = bt * pad(h * w, 8) * pad(cout, 128) * 2
        pad_in = bt * (h_in + 2) * pad(w_in + 2, 16) * pad(cin, 128) * 2
        scr = bt * (h + 2) * pad(w + 2, 16) * (pad(cin, 128) + pad(cout, 128)) * 2
        work = 2 * bt * n_big * max(cin, cout) * 4
        return 2 * x_blk + 2 * o_blk + pad_in + scr + work

    weights = (9 * (cin * cout + cout * cout) + cin * cout) * 2 + (
        cin * cin + cout * cout
    ) * 4
    budget = 11 * 2**20
    bt_env = int(_os.environ.get("GDDIM_TRANSITION_BT", "0"))
    if bt_env and b % bt_env == 0:
        return bt_env
    for bt in (16, 8, 4, 2, 1):
        if b % bt:
            continue
        if est(bt) + weights <= budget:
            return bt
    return 1


def transition_supported(x_shape, cout: int, up: bool, fir: bool, fir_kernel) -> bool:
    b, h_in, w_in, c = x_shape
    if fir and len(fir_kernel) != 4:
        return False
    h, w = (2 * h_in, 2 * w_in) if up else (h_in // 2, w_in // 2)
    # default OFF: the whole-transition kernel measured SLOWER than the
    # tail composition at EVERY flagship shape (scripts/exp_transition.py,
    # b128: full 5.24 ms vs tail 3.43 ms summed) — the in-kernel per-sample
    # f32 polyphase FIR serializes on the VPU while XLA's separable FIR conv
    # pipelines on the MXU. Kept behind GDDIM_TRANSITION_IMPL=full.
    return (
        jax.default_backend() == "tpu"
        and _os.environ.get("GDDIM_TRANSITION_IMPL", "off") == "full"
        and c % 128 == 0
        and cout % 128 == 0
        and h_in % 2 == 0
        and w_in % 2 == 0
        and (h + 2) * (w + 2) * (c + cout) * 2 < 10 * 2**20
        and (h_in + 2) * (w_in + 2) * c * 2 < 6 * 2**20
    )


def fused_resblock_transition(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, *, up: bool, fir: bool, fir_kernel=(1, 3, 3, 1),
    num_groups1: int, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True, mm_dtype=None, act_scales=None,
):
    """Whole transition block (reference layerspp.py:180-227 with up/down)
    fused into one kernel — see _resblock_transition_kernel.

    x: (B, H, W, C) PRE-resample; w_skip: (C, Cout) REQUIRED. act_scales:
    (s1, s2, sx) where s1/sx were calibrated POST-resample (matching the
    sow sites in models/blocks.py) — the in-kernel quantization also runs
    post-resample, so calibrations transfer unchanged.
    """
    mm_dtype = mm_dtype or MM_DTYPE
    int8 = mm_dtype == jnp.int8
    static = bool(int8 and act_scales is not None)
    b, h_in, w_in, c = x.shape
    cout = w1.shape[-1]
    h, w = (2 * h_in, 2 * w_in) if up else (h_in // 2, w_in // 2)
    kern_h, kern_w = _transition_kerns(up, fir, fir_kernel)
    bt = _pick_bt_transition(b, h_in, w_in, c, cout, up)

    def prep_w(wm, shape, quant=None):
        quant = int8 if quant is None else quant
        wm = jnp.asarray(wm, jnp.float32).reshape(shape)
        if not quant:
            dt = jnp.bfloat16 if (int8 or mm_dtype == jnp.bfloat16) else wm.dtype
            return wm.astype(dt), jnp.ones((1, shape[-1]), jnp.float32)
        axes = tuple(range(wm.ndim - 1))
        sc = jnp.maximum(jnp.abs(wm).max(axis=axes), 1e-12) / 127.0
        q = jnp.clip(jnp.round(wm / sc), -127, 127).astype(jnp.int8)
        return q, sc.reshape(1, -1)

    inv_n1 = 1.0 / (h_in * w_in * (c // num_groups1))
    inv_n2 = 1.0 / (h * w * (cout // num_groups2))
    static_skip = bool(static and act_scales[2] is not None)
    kernel = functools.partial(
        _resblock_transition_kernel,
        bt=bt, h_in=h_in, w_in=w_in, h=h, w=w, cin=c, cout=cout,
        inv_n1=inv_n1, inv_n2=inv_n2, eps=eps, rescale=skip_rescale,
        mm_dtype=mm_dtype, up=up, kern_h=kern_h, kern_w=kern_w,
        static_scales=static, static_skip=static_skip,
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    w1_op, w1_sc = prep_w(w1, (9, c, cout))
    w2_op, w2_sc = prep_w(w2, (9, cout, cout))
    wsk_op, wsk_sc = prep_w(w_skip, (c, cout), quant=int8 and static_skip)
    if static:
        s1, s2, sx = act_scales
        w1_sc = w1_sc * s1
        w2_sc = w2_sc * s2
        if static_skip:
            wsk_sc = wsk_sc * sx
    temb_b = jnp.broadcast_to(
        jnp.asarray(temb_proj, jnp.float32)[:, None, :], (b, 8, cout)
    )
    args = [
        x.reshape(b, h_in * w_in, c),
        temb_b,
        row(gn1_scale), row(gn1_bias), _group_indicator(c, num_groups1),
        w1_op, row(b1), w1_sc,
        row(gn2_scale), row(gn2_bias), _group_indicator(cout, num_groups2),
        w2_op, row(b2), w2_sc,
        wsk_op,
        (row(b_skip) if b_skip is not None else jnp.zeros((1, cout), jnp.float32)),
        wsk_sc,
    ]
    if static:
        args.append(_qs_row(act_scales))
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h_in * w_in, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            const((1, c)), const((1, c)), const((c, c)),
            const((9, c, cout)), const((1, cout)), const((1, cout)),
            const((1, cout)), const((1, cout)), const((cout, cout)),
            const((9, cout, cout)), const((1, cout)), const((1, cout)),
            const((c, cout)), const((1, cout)), const((1, cout)),
        ] + ([const((1, 128))] if static else []),
        out_specs=pl.BlockSpec(
            (bt, h * w, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w, cout), x.dtype),
        scratch_shapes=[
            # input-res resample scratch: bf16 in int8 mode (the unfused path
            # also resamples at model dtype), mm dtype otherwise (f32 tests)
            pltpu.VMEM(
                (bt, h_in + 2, w_in + 2, c),
                jnp.bfloat16 if int8 else mm_dtype,
            ),
            pltpu.VMEM((bt, h + 2, w + 2, c), mm_dtype),
            pltpu.VMEM((bt, h + 2, w + 2, cout), mm_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * (c * cout + cout * cout),
            bytes_accessed=b * (h_in * w_in + h * w) * (c + cout) * x.dtype.itemsize,
            transcendentals=b * (h_in * w_in * c + h * w * cout),
        ),
    )(*args)
    return out.reshape(b, h, w, cout)


def resblock_transition_reference(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, *, up: bool, fir: bool, fir_kernel=(1, 3, 3, 1),
    num_groups1: int, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True,
):
    """Unfused XLA composition of the whole transition block (oracle)."""
    from gddim_tpu.models import resample
    from gddim_tpu.ops.groupnorm import group_norm_silu_reference

    h = group_norm_silu_reference(x, gn1_scale, gn1_bias, num_groups1, eps)
    if fir:
        res = resample.upsample_2d if up else resample.downsample_2d
        h = res(h, fir_kernel, factor=2)
        xr = res(x, fir_kernel, factor=2)
    else:
        naive = resample.naive_upsample_2d if up else resample.naive_downsample_2d
        h = naive(h, factor=2)
        xr = naive(x, factor=2)
    return resblock_tail_reference(
        h, xr, temb_proj, w1, b1, gn2_scale, gn2_bias, w2, b2, w_skip, b_skip,
        num_groups2=num_groups2, eps=eps, skip_rescale=skip_rescale,
    )


def resblock_tail_reference(
    h, x_skip, temb_proj, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, *, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True,
):
    """Unfused XLA composition of the tail (correctness oracle)."""
    from gddim_tpu.ops.groupnorm import group_norm_silu_reference

    y = jax.lax.conv_general_dilated(
        h, jnp.asarray(w1, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b1, h.dtype) + jnp.asarray(temb_proj, h.dtype)[:, None, None, :]
    y = group_norm_silu_reference(y, gn2_scale, gn2_bias, num_groups2, eps)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(w2, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b2, h.dtype)
    skip = jnp.einsum("bhwc,cd->bhwd", x_skip, jnp.asarray(w_skip, x_skip.dtype))
    if b_skip is not None:
        skip = skip + jnp.asarray(b_skip, x_skip.dtype)
    out = skip + y
    if skip_rescale:
        out = out * _INV_SQRT2
    return out


def resblock_reference(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip=None, b_skip=None, *, num_groups1: int, num_groups2: int,
    eps: float = 1e-6, skip_rescale: bool = True,
):
    """Unfused XLA composition (correctness oracle + non-TPU fallback)."""
    from gddim_tpu.ops.groupnorm import group_norm_silu_reference

    h = group_norm_silu_reference(x, gn1_scale, gn1_bias, num_groups1, eps)
    h = jax.lax.conv_general_dilated(
        h, jnp.asarray(w1, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b1, h.dtype) + jnp.asarray(temb_proj, h.dtype)[:, None, None, :]
    h = group_norm_silu_reference(h, gn2_scale, gn2_bias, num_groups2, eps)
    h = jax.lax.conv_general_dilated(
        h, jnp.asarray(w2, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b2, h.dtype)
    if w_skip is None:
        skip = x
    else:
        skip = jnp.einsum("bhwc,cd->bhwd", x, jnp.asarray(w_skip, x.dtype))
        if b_skip is not None:
            skip = skip + jnp.asarray(b_skip, x.dtype)
    out = skip + h
    if skip_rescale:
        out = out * _INV_SQRT2
    return out


def resblock_train_reference(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, mask, *, keep_prob: float, has_skip: bool,
    num_groups1: int, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True,
):
    """Unfused XLA composition of one TRAINING residual block: the inference
    oracle plus nn.Dropout applied after GN2+SiLU with an explicit int8 mask
    (out = h * mask / keep_prob). Computes in x.dtype like the model's train
    path (bf16 convs when the model runs bf16); this is both the gradient
    oracle for fused_resblock_train's backward and the non-TPU fallback."""
    from gddim_tpu.ops.groupnorm import group_norm_silu_reference

    h = group_norm_silu_reference(x, gn1_scale, gn1_bias, num_groups1, eps)
    h = jax.lax.conv_general_dilated(
        h, jnp.asarray(w1, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b1, h.dtype) + jnp.asarray(temb_proj, h.dtype)[:, None, None, :]
    h = group_norm_silu_reference(h, gn2_scale, gn2_bias, num_groups2, eps)
    if keep_prob < 1.0:
        h = h * (mask.astype(h.dtype) * jnp.asarray(1.0 / keep_prob, h.dtype))
    h = jax.lax.conv_general_dilated(
        h, jnp.asarray(w2, h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b2, h.dtype)
    if has_skip:
        skip = jnp.einsum("bhwc,cd->bhwd", x, jnp.asarray(w_skip, x.dtype))
        skip = skip + jnp.asarray(b_skip, x.dtype)
    else:
        skip = x
    out = skip + h
    if skip_rescale:
        out = out * _INV_SQRT2
    return out


def make_fused_resblock_train(
    *, num_groups1: int, num_groups2: int, eps: float = 1e-6,
    skip_rescale: bool = True, keep_prob: float = 1.0, has_skip: bool,
    mm_dtype=None,
):
    """Differentiable fused residual block for TRAINING (round-4 verdict #4).

    Forward: the fused Pallas kernel (bf16 MXU, one HBM read of x / write of
    out) with the dropout mask applied in-kernel. Backward: jax.vjp of the
    unfused XLA composition recomputed from the saved primal inputs — the
    ops/groupnorm.py custom_vjp pattern scaled to the whole block. Gradients
    are therefore EXACTLY the unfused path's gradients (same mask), while the
    forward pass runs at fused-kernel speed; the forward/backward value skew
    is the kernel-vs-XLA bf16 difference (<1e-3 rel, tests).

    Returns f(x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
    w2, b2, w_skip, b_skip, mask). mask: (B, H, W, Cout) int8 {0,1}; pass an
    all-ones mask when keep_prob == 1. When has_skip is False, w_skip/b_skip
    are ignored placeholders (zero gradients).

    Backward policy (GDDIM_FUSED_BWD): '1' (default) takes the fused Pallas
    backward kernel (ops/resblock_bwd.py — one VMEM pass recomputing the
    interior and producing all thirteen gradients) wherever its VMEM
    estimate fits; '0' forces the XLA recompute of the unfused composition
    everywhere. Both produce the reference block's gradients; the Pallas
    path differs only by bf16 matmul rounding (equivalence-gated in
    tests/test_ops.py).
    """
    mmdt = mm_dtype or jnp.bfloat16
    ref_kw = dict(
        keep_prob=keep_prob, has_skip=has_skip, num_groups1=num_groups1,
        num_groups2=num_groups2, eps=eps, skip_rescale=skip_rescale,
    )

    @jax.custom_vjp
    def f(x, temb_proj, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2,
          w_skip, b_skip, mask):
        if jax.default_backend() == "tpu" and supported(x.shape, w1.shape[-1]):
            return fused_resblock(
                x, temb_proj, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2,
                w_skip if has_skip else None, b_skip if has_skip else None,
                num_groups1=num_groups1, num_groups2=num_groups2, eps=eps,
                skip_rescale=skip_rescale, mm_dtype=mmdt,
                drop_mask=mask if keep_prob < 1.0 else None,
                keep_prob=keep_prob,
            )
        return resblock_train_reference(
            x, temb_proj, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2,
            w_skip, b_skip, mask, **ref_kw,
        )

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        diff, mask = res[:12], res[12]
        from gddim_tpu.ops import resblock_bwd as _bwd

        x = diff[0]
        if (
            _os.environ.get("GDDIM_FUSED_BWD", "1") != "0"
            and jax.default_backend() == "tpu"
            and _bwd.supported_bwd(x.shape, diff[4].shape[-1])
        ):
            grads = _bwd.fused_resblock_train_grads(
                *diff, mask, g, num_groups1=num_groups1,
                num_groups2=num_groups2, eps=eps, skip_rescale=skip_rescale,
                keep_prob=keep_prob, has_skip=has_skip, mm_dtype=mmdt,
            )
        else:
            _, vjp = jax.vjp(
                lambda *a: resblock_train_reference(*a, mask, **ref_kw), *diff
            )
            grads = vjp(g)
        # integer-dtype primal -> float0 cotangent
        mask_ct = np.zeros(mask.shape, dtype=jax.dtypes.float0)
        return (*grads, mask_ct)

    f.defvjp(fwd, bwd)
    return f


def supported(x_shape, cout: int) -> bool:
    b, h, w, c = x_shape
    # per-shape fused-vs-XLA policy hook ("1024" vetoes the 32x32 level):
    # at K=N=128 widths the int8 MXU sits at its narrow-shape wall
    # (~126-144 TOP/s, scripts/exp_mm_width.py) while XLA's bf16 conv
    # lowering reaches ~200 TF/s — the unfused XLA path can win there.
    veto = _os.environ.get("GDDIM_FUSED_VETO_N", "")
    if veto and h * w in {int(v) for v in veto.split(",")}:
        return False
    return (
        jax.default_backend() == "tpu"
        and c % 128 == 0
        and cout % 128 == 0
        and (h + 2) * (w + 2) * (c + cout) * 2 < 10 * 2**20
    )
