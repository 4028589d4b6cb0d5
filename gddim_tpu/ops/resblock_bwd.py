"""Fused residual-block BACKWARD Pallas kernel (training fast path).

make_fused_resblock_train (ops/resblock.py) runs the block forward as one
Pallas kernel, but its backward is jax.vjp of the unfused XLA composition
recomputed from the block inputs — a ~10-pass HBM chain per block (GN
backward reductions, silu/dropout elementwise passes, f32 grad traffic)
that the round-5 training decomposition puts at the majority of the
training step. This kernel computes ALL thirteen gradients of one training
residual block in a single VMEM pass per batch tile:

    reads:  x, g (= dL/dout), dropout mask, temb rows, params
    writes: dx, dtemb_proj, and dGN1 / dW1 / db1 / dGN2 / dW2 / db2 /
            dW_skip / db_skip accumulated across the batch grid

The forward interior (GN1+SiLU, conv1(+b1+temb), GN2+SiLU, dropout) is
recomputed in-kernel from x — the same scatter-form conv and vectorized
GN-statistics (group-indicator matmul) as the inference kernel — so no
interior activation ever exists in HBM. The five gradient matmuls run on
the MXU: dgrad1/dgrad2 are scatter-form convs with tap-flipped transposed
weights, wgrad1/wgrad2 are tap-shifted (M, C)^T x (M, C') contractions
over the tile's M = bt*h*w rows, plus the 1x1 skip dgrad/wgrad. Weight
gradients accumulate f32 in output blocks that persist across the
sequential batch grid (every step maps to block 0, initialized at step 0).

Semantics: exactly the gradients of resblock_train_reference (the
reference block, cld_jax/models/layerspp.py:146-227, plus nn.Dropout as
an explicit mask), up to matmul dtype; exactness gates run mm_dtype=f32
in interpret mode (tests/test_ops.py).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.ops.groupnorm import _group_indicator
from gddim_tpu.ops.resblock import _conv9_scatter, _pack_w_scatter

_INV_SQRT2 = 0.7071067811865476
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]

# wgrad tap-group width (taps per contraction): trades the (M, gw*C)
# shifted-operand concat's VMEM against matmul width, mirroring
# GDDIM_CONV9_GROUP on the forward side
WGRAD_GROUP = int(_os.environ.get("GDDIM_BWD_WGRAD_GROUP", "3"))


def _tap_shift(v, dy, dx):
    """v: (bt, h, w, C) -> shifted[o] = v[o + (dy-1, dx-1)], zero-padded.

    Same index arithmetic as _conv9_scatter's epilogue: the (dy, dx) tap of
    a SAME conv reads input offset (dy-1, dx-1), so wgrad contracts the
    output cotangent against this shift of the conv input.
    """
    bt, h, w, c = v.shape
    oy0, oy1 = max(0, 1 - dy), h - max(0, dy - 1)
    ox0, ox1 = max(0, 1 - dx), w - max(0, dx - 1)
    iy0, ix0 = oy0 + dy - 1, ox0 + dx - 1
    sl = v[:, iy0 : iy0 + (oy1 - oy0), ix0 : ix0 + (ox1 - ox0), :]
    return jax.lax.pad(
        sl, jnp.zeros((), v.dtype),
        ((0, 0, 0), (oy0, h - oy1, 0), (ox0, w - ox1, 0), (0, 0, 0)),
    )


def _wgrad9(v4, rhs_mm, cout, mm_dtype, gw):
    """Sum_o shift_t(v)[o] (x) rhs[o] for all 9 taps -> (9*C, cout) f32.

    v4: (bt, h, w, C) values in mm dtype; rhs_mm: (bt*h*w, cout) mm dtype.
    Contraction runs over the tile's M rows (an MXU-friendly reduction
    matmul); taps are grouped gw at a time to bound the concat operand.
    """
    bt, h, w, c = v4.shape
    m = bt * h * w
    parts = []
    for g0 in range(0, 9, gw):
        taps = _TAPS[g0 : g0 + gw]
        lhs = jnp.concatenate(
            [_tap_shift(v4, dy, dx).reshape(m, c) for dy, dx in taps], axis=1
        )
        parts.append(
            jax.lax.dot_general(
                lhs, rhs_mm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(parts, axis=0)


def _dgrad9(gmm, wf_ref, bt, h, w, cin, cout, mm_dtype):
    """Conv dgrad from the FORWARD-packed (cin, 9*cout) weights: per tap,
    y_t = g @ W[t]^T (a transposed-contraction dot — the MXU streams either
    orientation), scattered with the flipped shift. Avoids holding a second
    tap-flipped transposed weight layout in VMEM, which is what pushed the
    wide-cin pair shapes over the scoped-VMEM limit.

    dx[o] = sum_t g[o - dt] @ W[t]^T  ==  sum_t shift_{flip t}(g @ W[t]^T)[o].
    """
    acc = jnp.zeros((bt, h, w, cin), jnp.float32)
    for t, (dy, dx) in enumerate(_TAPS):
        wt = wf_ref[:, t * cout : (t + 1) * cout]
        y = jax.lax.dot_general(
            gmm, wt.astype(mm_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bt, h, w, cin)
        acc = acc + _tap_shift(y, 2 - dy, 2 - dx)
    return acc.reshape(bt * h * w, cin)


def _resblock_bwd_kernel(
    x_ref, g_ref, temb_ref, gn1s_ref, gn1b_ref, p1_ref, w1f_ref, b1_ref,
    gn2s_ref, gn2b_ref, p2_ref, w2f_ref, wskip_ref,
    *rest,
    bt, h, w, cin, cout, inv_n1, inv_n2, eps, has_skip, rescale, mm_dtype,
    has_mask, inv_keep, gw,
):
    """One batch tile: recompute the forward interior from x, then produce
    every gradient. All tile math is vectorized over (bt, n, C) like the v2
    forward body; GN statistics and their backward reductions ride the
    (C, C) group-indicator matmul.

    VMEM discipline (what lets the wide-cin pairs fit): only yhat1/sig1 and
    yhat2/sig2 persist from the recompute — x, y1, y2 and the conv1 output
    are re-derived from them on use (x = yhat1/rstd + mean, y = yhat*s + b,
    two VPU ops each); the dgrads read the FORWARD-packed weights via
    transposed-contraction dots (_dgrad9), so no second weight layout is
    resident; wgrad/skip matmul inputs exist only as mm-dtype casts."""
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    (dx_ref, dtemb_ref, rows_cin_ref, rows_cout_ref, dw1_ref, dw2_ref,
     dwskip_ref) = rest
    f32 = jnp.float32
    n = h * w

    @pl.when(pl.program_id(0) == 0)
    def _init_accumulators():
        rows_cin_ref[...] = jnp.zeros_like(rows_cin_ref)
        rows_cout_ref[...] = jnp.zeros_like(rows_cout_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dwskip_ref[...] = jnp.zeros_like(dwskip_ref)

    def gn_stats(v3, pmat, inv_n):
        s = jnp.sum(v3, axis=1)
        sq = jnp.sum(v3 * v3, axis=1)
        mean = jax.lax.dot(s, pmat, preferred_element_type=f32) * inv_n
        esq = jax.lax.dot(sq, pmat, preferred_element_type=f32) * inv_n
        return mean, jax.lax.rsqrt(esq - mean * mean + eps)

    def gmean(v3, pmat, inv_n):  # per-(sample, group) mean, channel-broadcast
        return (
            jax.lax.dot(jnp.sum(v3, axis=1), pmat, preferred_element_type=f32)
            * inv_n
        )

    # ---- forward recompute: GN1+SiLU -> conv1+b1+temb -> GN2+SiLU ---------
    x3 = x_ref[...].astype(f32)  # (bt, n, cin); dies after yhat1
    mean1, rstd1 = gn_stats(x3, p1_ref[...], inv_n1)
    yhat1 = (x3 - mean1[:, None, :]) * rstd1[:, None, :]

    def y1_of():  # recompute GN1 affine output from the held normalized value
        return yhat1 * gn1s_ref[...] + gn1b_ref[...]

    sig1 = jax.nn.sigmoid(y1_of())
    a1mm = (y1_of() * sig1).reshape(bt * n, cin).astype(mm_dtype)
    u3 = (
        _conv9_scatter([a1mm], w1f_ref, bt, h, w, cout, mm_dtype)
        .reshape(bt, n, cout)
        .astype(f32)
        + b1_ref[...][None]
        + temb_ref[:, 0:1, :]
    )
    mean2, rstd2 = gn_stats(u3, p2_ref[...], inv_n2)
    yhat2 = (u3 - mean2[:, None, :]) * rstd2[:, None, :]

    def y2_of():
        return yhat2 * gn2s_ref[...] + gn2b_ref[...]

    sig2 = jax.nn.sigmoid(y2_of())

    # ---- epilogue backward: out = (skip + conv2(d) + b2) * r --------------
    g3 = g_ref[...].astype(f32)
    if rescale:
        g3 = g3 * _INV_SQRT2
    gmm = g3.reshape(bt * n, cout).astype(mm_dtype)
    gsum = jnp.sum(g3, axis=(0, 1))[None]  # = db2 (and db_skip) tile share

    # ---- conv2 backward ---------------------------------------------------
    # wgrad2 contracts the dropout output d against g; d is recomputed here
    d3 = y2_of() * sig2
    if has_mask:
        maskf = mask_ref[...].astype(f32) * inv_keep
        d3 = d3 * maskf
    dw2_ref[...] += _wgrad9(
        d3.reshape(bt, h, w, cout).astype(mm_dtype), gmm, cout, mm_dtype, gw
    )
    gd3 = _dgrad9(gmm, w2f_ref, bt, h, w, cout, cout, mm_dtype).reshape(
        bt, n, cout
    )
    if has_mask:
        gd3 = gd3 * maskf

    # ---- GN2+SiLU backward -> gu = dL/du ----------------------------------
    dy2 = gd3 * (sig2 * (1.0 + y2_of() * (1.0 - sig2)))
    dgn2s = jnp.sum(dy2 * yhat2, axis=(0, 1))[None]
    dgn2b = jnp.sum(dy2, axis=(0, 1))[None]
    dyh2 = dy2 * gn2s_ref[...]
    s1 = gmean(dyh2, p2_ref[...], inv_n2)
    s2 = gmean(dyh2 * yhat2, p2_ref[...], inv_n2)
    gu = rstd2[:, None, :] * (dyh2 - s1[:, None, :] - yhat2 * s2[:, None, :])
    db1 = jnp.sum(gu, axis=(0, 1))[None]
    dtemb = jnp.sum(gu, axis=1)  # (bt, cout)
    dtemb_ref[...] = jnp.broadcast_to(
        dtemb[:, None, :], (bt, 8, cout)
    ).astype(dtemb_ref.dtype)
    gumm = gu.reshape(bt * n, cout).astype(mm_dtype)

    # ---- conv1 backward ---------------------------------------------------
    dw1_ref[...] += _wgrad9(
        (y1_of() * sig1).reshape(bt, h, w, cin).astype(mm_dtype),
        gumm, cout, mm_dtype, gw,
    )
    ga1 = _dgrad9(gumm, w1f_ref, bt, h, w, cin, cout, mm_dtype).reshape(
        bt, n, cin
    )

    # ---- GN1+SiLU backward -> dx (main branch) ----------------------------
    dy1 = ga1 * (sig1 * (1.0 + y1_of() * (1.0 - sig1)))
    dgn1s = jnp.sum(dy1 * yhat1, axis=(0, 1))[None]
    dgn1b = jnp.sum(dy1, axis=(0, 1))[None]
    dyh1 = dy1 * gn1s_ref[...]
    s1a = gmean(dyh1, p1_ref[...], inv_n1)
    s2a = gmean(dyh1 * yhat1, p1_ref[...], inv_n1)
    dx3 = rstd1[:, None, :] * (
        dyh1 - s1a[:, None, :] - yhat1 * s2a[:, None, :]
    )

    # ---- skip branch (x re-derived from yhat1: x died after the stats) ----
    if has_skip:
        x_rec = (
            yhat1 / rstd1[:, None, :] + mean1[:, None, :]
        ).reshape(bt * n, cin).astype(mm_dtype)
        dwskip_ref[...] += jax.lax.dot_general(
            x_rec, gmm, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        dx3 = dx3 + jax.lax.dot_general(
            gmm, wskip_ref[...].astype(mm_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        ).reshape(bt, n, cin)
    else:
        dx3 = dx3 + g3  # identity skip (cin == cout)
    dx_ref[...] = dx3.astype(dx_ref.dtype)

    # ---- packed row accumulators ------------------------------------------
    zc = jnp.zeros((1, cin), f32)
    rows_cin_ref[...] += jnp.concatenate(
        [dgn1s, dgn1b] + [zc] * 6, axis=0
    )
    zo = jnp.zeros((1, cout), f32)
    rows_cout_ref[...] += jnp.concatenate(
        [db1, dgn2s, dgn2b, gsum] + [zo] * 4, axis=0
    )


def _parse_bt_map(env: str) -> dict:
    out = {}
    for e in _os.environ.get(env, "").split(","):
        if not e:
            continue
        k, v = e.split(":")
        key = tuple(int(p) for p in k.split(".")) if "." in k else (int(k), None)
        out[key] = int(v)
    return out


# per-shape batch-tile picks, keyed (n, cin) like the forward maps; value 0
# vetoes the Pallas backward for that shape (XLA recompute fallback).
# Defaults come from the round-5 on-chip probe (scripts/exp_bwd_shapes.py)
# confirmed end-to-end: enabling the 32x32 pair backward (bt=1, a shape the
# VMEM estimate wrongly rejected — the probe compiled and ran it) took the
# b128 training step 716.8 -> 789.0 img/s. GDDIM_BWD_BT_MAP overrides per
# key.
_DEFAULT_BWD_BT_MAP: dict = {(1024, 256): 1}


def _bwd_bt_map() -> dict:
    return {**_DEFAULT_BWD_BT_MAP, **_parse_bt_map("GDDIM_BWD_BT_MAP")}


def _pick_bt_bwd(b, h, w, cin, cout, gw) -> int:
    """Batch tile for the backward kernel: per-shape probe map first, then
    the largest tile whose resident-set estimate fits Mosaic's scoped-VMEM
    limit. The estimate budgets the persistent normalized values (yhat1/
    sig1 f32 at cin, yhat2/sig2/others at cout), the live cotangent chain,
    the mm-dtype casts, the wgrad concat, the dgrad per-tap intermediate,
    the double-buffered blocks, the forward-packed weights and the f32
    weight-grad accumulators."""

    def pad(v, m):
        return -(-v // m) * m

    n = h * w
    ci, co = pad(cin, 128), pad(cout, 128)

    bt_env = int(_os.environ.get("GDDIM_BWD_BT", "0"))
    if bt_env and b % bt_env == 0:
        return bt_env
    for key in ((n, cin), (n, None)):
        if key in _bwd_bt_map():
            bt_m = _bwd_bt_map()[key]
            if bt_m == 0:
                return 0
            if b % bt_m == 0:
                return bt_m
            break

    def est(bt):
        cin_tiles = 4 * bt * n * ci * 4 + 2 * bt * n * ci * 2
        cout_tiles = 5 * bt * n * co * 4 + 3 * bt * n * co * 2
        concat = bt * n * gw * max(ci, co) * 2
        conv_int = bt * n * 3 * max(ci, co) * 4  # scatter/dgrad intermediate
        blocks = 2 * bt * n * (ci + co) * 2 * 2  # x,g dx double-buffered
        return cin_tiles + cout_tiles + concat + conv_int + blocks

    weights = 9 * (cin * cout + cout * cout) * 2 + cin * cout * 2 + (
        cin * cin + cout * cout
    ) * 4
    accums = (9 * cin * cout + 9 * cout * cout + cin * cout) * 4
    HARD = int(15.0 * 2**20)
    for bt in (32, 16, 8, 4, 2, 1):
        if b % bt:
            continue
        if est(bt) + weights + accums <= HARD:
            return bt
    return 0  # does not fit even at bt=1: caller falls back to XLA


def supported_bwd(x_shape, cout: int) -> bool:
    b, h, w, c = x_shape
    return (
        c % 128 == 0
        and cout % 128 == 0
        and _pick_bt_bwd(b, h, w, c, cout, WGRAD_GROUP) > 0
    )


def fused_resblock_train_grads(
    x, temb_proj, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias, w2, b2,
    w_skip, b_skip, mask, g, *, num_groups1: int, num_groups2: int,
    eps: float = 1e-6, skip_rescale: bool = True, keep_prob: float = 1.0,
    has_skip: bool, mm_dtype=None,
):
    """All 12 gradients of resblock_train_reference wrt its differentiable
    args, from one fused Pallas pass. g: cotangent of the block output.
    Returns (dx, dtemb_proj, dgn1s, dgn1b, dw1, db1, dgn2s, dgn2b, dw2,
    db2, dw_skip, db_skip) with dtypes matching the primals."""
    mm_dtype = mm_dtype or jnp.bfloat16
    b, h, w_, cin = x.shape
    cout = w1.shape[-1]
    has_mask = keep_prob < 1.0
    gw = WGRAD_GROUP
    bt = _pick_bt_bwd(b, h, w_, cin, cout, gw)
    assert bt > 0, (x.shape, cout)
    n = h * w_

    wdt = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    # forward-packed layouts only: the dgrads contract the transposed side
    # in-kernel (_dgrad9), so no tap-flipped copies are resident
    w1f = _pack_w_scatter(
        jnp.asarray(w1, jnp.float32).reshape(9, cin, cout).astype(wdt)
    )  # (cin, 9*cout)
    w2f = _pack_w_scatter(
        jnp.asarray(w2, jnp.float32).reshape(9, cout, cout).astype(wdt)
    )  # (cout, 9*cout)
    wskip_op = (
        jnp.asarray(w_skip, jnp.float32).reshape(cin, cout).astype(wdt)
        if has_skip
        else jnp.zeros((cin, cout), wdt)
    )
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    temb_b = jnp.broadcast_to(
        jnp.asarray(temb_proj, jnp.float32)[:, None, :], (b, 8, cout)
    )
    inv_n1 = 1.0 / (n * (cin // num_groups1))
    inv_n2 = 1.0 / (n * (cout // num_groups2))
    kernel = functools.partial(
        _resblock_bwd_kernel,
        bt=bt, h=h, w=w_, cin=cin, cout=cout, inv_n1=inv_n1, inv_n2=inv_n2,
        eps=eps, has_skip=has_skip, rescale=skip_rescale, mm_dtype=mm_dtype,
        has_mask=has_mask, inv_keep=1.0 / keep_prob, gw=gw,
    )
    args = [
        x.reshape(b, n, cin),
        jnp.asarray(g).reshape(b, n, cout),
        temb_b,
        row(gn1_scale), row(gn1_bias), _group_indicator(cin, num_groups1),
        w1f, row(b1),
        row(gn2_scale), row(gn2_bias), _group_indicator(cout, num_groups2),
        w2f, wskip_op,
    ]
    if has_mask:
        args.append(jnp.asarray(mask, jnp.int8).reshape(b, n, cout))
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    blocked = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            blocked((bt, n, cin)),
            blocked((bt, n, cout)),
            blocked((bt, 8, cout)),
            const((1, cin)), const((1, cin)), const((cin, cin)),
            const(w1f.shape), const((1, cout)),
            const((1, cout)), const((1, cout)), const((cout, cout)),
            const(w2f.shape), const((cin, cout)),
        ] + ([blocked((bt, n, cout))] if has_mask else []),
        out_specs=[
            blocked((bt, n, cin)),         # dx
            blocked((bt, 8, cout)),        # dtemb rows
            const((8, cin)),               # [dgn1s, dgn1b]
            const((8, cout)),              # [db1, dgn2s, dgn2b, db2]
            const((9 * cin, cout)),        # dw1 (tap-major rows)
            const((9 * cout, cout)),       # dw2
            const((cin, cout)),            # dw_skip
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, cin), x.dtype),
            jax.ShapeDtypeStruct((b, 8, cout), jnp.float32),
            jax.ShapeDtypeStruct((8, cin), jnp.float32),
            jax.ShapeDtypeStruct((8, cout), jnp.float32),
            jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((9 * cout, cout), jnp.float32),
            jax.ShapeDtypeStruct((cin, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # recompute conv1 + dgrad1/2 + wgrad1/2 + skip dgrad/wgrad
            flops=2 * b * n * 9 * (3 * cin * cout + 2 * cout * cout)
            + 4 * b * n * cin * cout,
            bytes_accessed=b * n * (2 * cin + 2 * cout) * x.dtype.itemsize,
            transcendentals=4 * b * n * (cin + cout),
        ),
    )(*args)
    dx, dtemb_o, rows_cin, rows_cout, dw1r, dw2r, dwskip = outs
    dt = lambda ref, v: v.astype(jnp.asarray(ref).dtype)
    dw1 = dw1r.reshape(3, 3, cin, cout)
    dw2 = dw2r.reshape(3, 3, cout, cout)
    if has_skip:
        dwsk = dt(w_skip, dwskip)
        dbsk = dt(b_skip, rows_cout[3])
    else:
        dwsk = jnp.zeros_like(jnp.asarray(w_skip))
        dbsk = jnp.zeros_like(jnp.asarray(b_skip))
    return (
        dx.reshape(x.shape),
        dt(temb_proj, dtemb_o[:, 0, :]),
        dt(gn1_scale, rows_cin[0]), dt(gn1_bias, rows_cin[1]),
        dt(w1, dw1.reshape(jnp.asarray(w1).shape)), dt(b1, rows_cout[0]),
        dt(gn2_scale, rows_cout[1]), dt(gn2_bias, rows_cout[2]),
        dt(w2, dw2.reshape(jnp.asarray(w2).shape)), dt(b2, rows_cout[3]),
        dwsk, dbsk,
    )
