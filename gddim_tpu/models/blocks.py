"""NCSN++ building blocks (reference: cld_jax/models/layerspp.py).

Class names and intra-block module creation order deliberately mirror the
reference so `nn.compact` auto-numbering produces the same parameter tree as
the published checkpoints (see gddim_tpu/checkpoints/legacy.py).
"""

from __future__ import annotations

import os as _os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.models import layers, resample
from gddim_tpu.models.layers import NIN, conv1x1, conv3x3, default_init, group_norm, norm_act
from gddim_tpu.ops.attention import self_attention_2d

# 1/sqrt(2) as a python float: weak-typed, so bf16 residual adds stay bf16
# (np.sqrt(2.0) is a strong float64 scalar and silently promotes to f32).
_INV_SQRT2 = 0.7071067811865476


def _amax(h):
    return jnp.max(jnp.abs(h.astype(jnp.float32)))


def _sow_amax(mod, name, h):
    """Record the activation amax at an int8 quantization site during a
    calibration pass (apply with mutable=['qscales']); folds the max across
    repeated calls (multiple timesteps/batches in one apply)."""
    mod.sow(
        "qscales", name, _amax(h),
        init_fn=lambda: jnp.zeros((), jnp.float32),
        reduce_fn=jnp.maximum,
    )


def _calibrating(mod) -> bool:
    return mod.is_mutable_collection("qscales") and not mod.is_initializing()


def _static_scales(mod, *site_names):
    """Calibrated static activation scales for this module's quant sites, or
    None when absent/not int8 (-> per-sample dynamic scales in-kernel).
    None entries in site_names stay None (sites without a projection)."""
    from gddim_tpu.ops.resblock import act_scales_from_amax

    if layers.CONV3X3_IMPL != "fused_int8":
        return None
    qs = mod.variables.get("qscales", None)
    if not qs:
        return None
    needed = [n for n in site_names if n is not None]
    if not all(n in qs for n in needed):
        return None
    return act_scales_from_amax(
        tuple(None if n is None else qs[n] for n in site_names)
    )


class AttnBlockpp(nn.Module):
    """Spatial self-attention block (reference layerspp.py:61-83)."""

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = True):
        # whole-block fusion (inference, conv_impl='fused'/'fused_int8'):
        # GN + q/k/v NINs + attention + out NIN + skip in one VMEM pass —
        # the (S, S) score matrix never touches HBM (ops/attnblock.py).
        # Inference-only: the kernel has no VJP (train=True falls through).
        from gddim_tpu.ops import attnblock as attnblock_ops

        calibrating = _calibrating(self)
        if (
            layers.CONV3X3_IMPL in ("fused", "fused_int8")
            and not train
            and not calibrating
            and not self.is_initializing()
            and attnblock_ops.supported(x.shape)
        ):
            vs = self.variables["params"]
            c = x.shape[-1]
            return attnblock_ops.fused_attnblock(
                x,
                vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                vs["NIN_0"]["W"], vs["NIN_0"]["b"],
                vs["NIN_1"]["W"], vs["NIN_1"]["b"],
                vs["NIN_2"]["W"], vs["NIN_2"]["b"],
                vs["NIN_3"]["W"], vs["NIN_3"]["b"],
                num_groups=min(c // 4, 32),
                skip_rescale=self.skip_rescale,
                mm_dtype=(
                    jnp.int8 if layers.CONV3X3_IMPL == "fused_int8"
                    else jnp.bfloat16
                ),
                act_scales=_static_scales(self, "h", "a"),
            )

        # TRAINING whole-block fusion for attention — measured NEGATIVE and
        # default OFF (round-5 chip A/B: 779.2 vs 789.0 img/s at b128 with
        # the fused resblock backward active; with remat off, XLA shares the
        # attention forward's matmuls with its VJP, and the opaque kernel
        # forward forces a full recompute instead). GDDIM_FUSED_ATTN_TRAIN=1
        # re-enables (ops/attnblock.py:make_fused_attnblock_train).
        if (
            layers.FUSED_TRAIN
            and _os.environ.get("GDDIM_FUSED_ATTN_TRAIN", "0") == "1"
            and train
            and not calibrating
            and not self.is_initializing()
            and attnblock_ops.supported(x.shape)
        ):
            vs = self.variables["params"]
            c = x.shape[-1]
            f = attnblock_ops.make_fused_attnblock_train(
                num_groups=min(c // 4, 32), skip_rescale=self.skip_rescale,
            )
            return f(
                x,
                vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                vs["NIN_0"]["W"], vs["NIN_0"]["b"],
                vs["NIN_1"]["W"], vs["NIN_1"]["b"],
                vs["NIN_2"]["W"], vs["NIN_2"]["b"],
                vs["NIN_3"]["W"], vs["NIN_3"]["b"],
            )

        h = group_norm(x)
        if calibrating:
            _sow_amax(self, "h", h)
        q = NIN(x.shape[-1], dtype=self.dtype)(h)
        k = NIN(x.shape[-1], dtype=self.dtype)(h)
        v = NIN(x.shape[-1], dtype=self.dtype)(h)
        h = self_attention_2d(q, k, v, impl=self.attention_impl)
        if calibrating:
            _sow_amax(self, "a", h)
        h = NIN(x.shape[-1], init_scale=self.init_scale, dtype=self.dtype)(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2


class Upsample(nn.Module):
    """(reference layerspp.py:86-112)"""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        if not self.fir:
            y = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            if self.with_conv:
                y = conv3x3(y, out_ch, dtype=self.dtype, allow_quantized=not train)
        else:
            if not self.with_conv:
                y = resample.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                y = resample.Conv2d(
                    out_ch,
                    kernel=3,
                    up=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    kernel_init=default_init(),
                    dtype=self.dtype,
                )(x)
        assert y.shape == (b, 2 * h, 2 * w, out_ch)
        return y


class Downsample(nn.Module):
    """(reference layerspp.py:115-143)"""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        if not self.fir:
            if self.with_conv:
                y = conv3x3(x, out_ch, stride=2, dtype=self.dtype)
            else:
                y = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        else:
            if not self.with_conv:
                y = resample.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                y = resample.Conv2d(
                    out_ch,
                    kernel=3,
                    down=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    kernel_init=default_init(),
                    dtype=self.dtype,
                )(x)
        assert y.shape == (b, h // 2, w // 2, out_ch)
        return y


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (reference layerspp.py:146-177)."""

    act: Any
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temb=None, train=True):
        if isinstance(x, (tuple, list)):  # up-path (h, skip) pair
            x = jnp.concatenate(x, axis=-1)
        _, _, _, c = x.shape
        out_ch = self.out_ch or c
        # whole-block fusion: same kernel as the BigGAN block (the DDPM block
        # differs only in its skip projection, NIN instead of conv1x1)
        from gddim_tpu.ops import resblock as resblock_ops

        calibrating = _calibrating(self)
        if (
            layers.CONV3X3_IMPL in ("fused", "fused_int8")
            and not train
            and not calibrating
            and temb is not None
            and self.act is nn.swish
            and not (c != out_ch and self.conv_shortcut)
            and not self.is_initializing()
            and resblock_ops.supported(x.shape, out_ch)
        ):
            vs = self.variables["params"]
            temb_proj = (
                self.act(temb).astype(jnp.float32)
                @ vs["Dense_0"]["kernel"].astype(jnp.float32)
                + vs["Dense_0"]["bias"].astype(jnp.float32)
            )
            w_skip = b_skip = None
            if c != out_ch:
                w_skip = vs["NIN_0"]["W"]
                b_skip = vs["NIN_0"]["b"]
            return resblock_ops.fused_resblock(
                x, temb_proj,
                vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                vs["Conv_0"]["kernel"], vs["Conv_0"]["bias"],
                vs["GroupNorm_1"]["scale"], vs["GroupNorm_1"]["bias"],
                vs["Conv_1"]["kernel"], vs["Conv_1"]["bias"],
                w_skip, b_skip,
                num_groups1=min(c // 4, 32),
                num_groups2=min(out_ch // 4, 32),
                skip_rescale=self.skip_rescale,
                mm_dtype=(
                    jnp.int8 if layers.CONV3X3_IMPL == "fused_int8"
                    else resblock_ops.MM_DTYPE
                ),
                # the "x" skip site quantizes pre-norm activations whose
                # range is input-dependent — always dynamic (None)
                act_scales=_static_scales(self, "a1", "a2", None),
            )

        # int8 inference: the norm+silu kernel emits the quantized tensor the
        # conv consumes directly (no standalone HBM quantize pass)
        fuse1 = (not train) and layers.int8_conv_fusion_ok(x.shape, out_ch)
        h = norm_act(x, self.act, quantize_out=fuse1)
        if calibrating:
            _sow_amax(self, "a1", h)
        h = conv3x3(h, out_ch, dtype=self.dtype, allow_quantized=not train)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(), dtype=self.dtype)(
                self.act(temb)
            )[:, None, None, :]
        fuse2 = (not train) and layers.int8_conv_fusion_ok(h.shape, out_ch)
        h = norm_act(h, self.act, quantize_out=fuse2)
        if calibrating:
            _sow_amax(self, "a2", h)
        if not fuse2:  # eval-time dropout is the identity; skip under fusion
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            if train:
                h = layers.tag_drop_out(h)
        h = conv3x3(h, out_ch, init_scale=self.init_scale, dtype=self.dtype, allow_quantized=not train)
        if c != out_ch:
            if calibrating and not self.conv_shortcut:
                _sow_amax(self, "x", x)
            if self.conv_shortcut:
                x = conv3x3(x, out_ch, dtype=self.dtype, allow_quantized=not train)
            else:
                x = NIN(out_ch, dtype=self.dtype)(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with in-block resampling
    (reference layerspp.py:180-227)."""

    act: Any
    up: bool = False
    down: bool = False
    out_ch: Optional[int] = None
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temb=None, train=True):
        # x may arrive as a (h, skip) pair from the U-Net up path: the fused
        # inference path consumes the two refs directly (concatenating before
        # a pallas_call materializes ~2x the activation in HBM, the call
        # being a fusion barrier); every other path concatenates here.
        parts = x if isinstance(x, (tuple, list)) else None
        if parts is not None:
            c = parts[0].shape[-1] + parts[1].shape[-1]
            x_shape = parts[0].shape[:-1] + (c,)
        else:
            c = x.shape[-1]
            x_shape = x.shape
        out_ch = self.out_ch or c
        # whole-block fusion (conv_impl='fused', inference): one Pallas kernel
        # runs GN+SiLU+conv+temb+GN+SiLU+conv+skip with the sample resident in
        # VMEM — the model is HBM-bound, so collapsing ~10 activation passes
        # into read-x/write-out is the dominant win (gddim_tpu/ops/resblock.py).
        # Params are read straight from this block's bound scope; init() takes
        # the normal path so the parameter tree is identical.
        from gddim_tpu.ops import resblock as resblock_ops

        calibrating = _calibrating(self)
        if (
            layers.CONV3X3_IMPL in ("fused", "fused_int8")
            and not train
            and not calibrating
            and not self.up and not self.down
            and temb is not None
            and self.act is nn.swish
            and not self.is_initializing()
            and resblock_ops.supported(x_shape, out_ch)
            and (
                parts is None
                or (
                    c != out_ch
                    and parts[0].shape[-1] % 128 == 0
                    and parts[1].shape[-1] % 128 == 0
                )
            )
        ):
            vs = self.variables["params"]
            temb_proj = (
                self.act(temb).astype(jnp.float32)
                @ vs["Dense_0"]["kernel"].astype(jnp.float32)
                + vs["Dense_0"]["bias"].astype(jnp.float32)
            )
            w_skip = b_skip = None
            if c != out_ch:
                w_skip = vs["Conv_2"]["kernel"][0, 0]
                b_skip = vs["Conv_2"]["bias"]
            kw = dict(
                num_groups1=min(c // 4, 32),
                num_groups2=min(out_ch // 4, 32),
                skip_rescale=self.skip_rescale,
                mm_dtype=(
                    jnp.int8 if layers.CONV3X3_IMPL == "fused_int8"
                    else resblock_ops.MM_DTYPE
                ),
                # the "x" skip site quantizes pre-norm activations whose
                # range is input-dependent — always dynamic (None)
                act_scales=_static_scales(self, "a1", "a2", None),
            )
            block_params = (
                vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                vs["Conv_0"]["kernel"], vs["Conv_0"]["bias"],
                vs["GroupNorm_1"]["scale"], vs["GroupNorm_1"]["bias"],
                vs["Conv_1"]["kernel"], vs["Conv_1"]["bias"],
            )
            if parts is not None:
                return resblock_ops.fused_resblock_pair(
                    parts[0], parts[1], temb_proj, *block_params,
                    w_skip, b_skip, **kw,
                )
            return resblock_ops.fused_resblock(
                x, temb_proj, *block_params, w_skip, b_skip, **kw
            )

        if parts is not None:  # every non-pair path consumes the concat
            x = jnp.concatenate(parts, axis=-1)

        # TRAINING whole-block fusion (model.fused_train): fused bf16 Pallas
        # forward with the dropout mask applied in-kernel; backward = jax.vjp
        # of the unfused composition recomputed from the block inputs
        # (ops/resblock.py:make_fused_resblock_train). Gradients are exactly
        # the unfused path's; interior activations are never materialized in
        # HBM (the custom_vjp saves only x + mask + param refs), so this
        # replaces remat for the eligible blocks.
        if (
            layers.FUSED_TRAIN
            and train
            and not calibrating
            and not self.up and not self.down
            and temb is not None
            and self.act is nn.swish
            and not self.is_initializing()
            and resblock_ops.supported(x.shape, out_ch)
        ):
            vs = self.variables["params"]
            temb_proj = (
                self.act(temb).astype(jnp.float32)
                @ vs["Dense_0"]["kernel"].astype(jnp.float32)
                + vs["Dense_0"]["bias"].astype(jnp.float32)
            )
            has_skip = c != out_ch
            if has_skip:
                w_skip, b_skip = vs["Conv_2"]["kernel"][0, 0], vs["Conv_2"]["bias"]
            else:  # ignored placeholders (zero gradients)
                w_skip = jnp.zeros((1, 1), x.dtype)
                b_skip = jnp.zeros((1,), x.dtype)
            keep_prob = 1.0 - self.dropout
            bshape = x.shape[:-1] + (out_ch,)
            if self.dropout > 0.0:
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep_prob, bshape
                ).astype(jnp.int8)
            else:
                mask = jnp.ones(bshape, jnp.int8)
            f = resblock_ops.make_fused_resblock_train(
                num_groups1=min(c // 4, 32),
                num_groups2=min(out_ch // 4, 32),
                skip_rescale=self.skip_rescale,
                keep_prob=keep_prob,
                has_skip=has_skip,
            )
            return f(
                x, temb_proj,
                vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                vs["Conv_0"]["kernel"], vs["Conv_0"]["bias"],
                vs["GroupNorm_1"]["scale"], vs["GroupNorm_1"]["bias"],
                vs["Conv_1"]["kernel"], vs["Conv_1"]["bias"],
                w_skip, b_skip, mask,
            )

        # up/down transition blocks. A whole-block kernel exists (GN1+SiLU +
        # in-kernel polyphase FIR of both paths + tail;
        # ops/resblock.py:fused_resblock_transition) but measured SLOWER
        # than the tail composition at every flagship shape (round 4,
        # scripts/exp_transition.py) — transition_supported() therefore
        # defaults it off; GDDIM_TRANSITION_IMPL=full re-enables.
        if (
            layers.CONV3X3_IMPL in ("fused", "fused_int8")
            and not train
            and not calibrating
            and (self.up or self.down)
            and temb is not None
            and self.act is nn.swish
            and not self.is_initializing()
        ):
            mmdt = (
                jnp.int8 if layers.CONV3X3_IMPL == "fused_int8"
                else resblock_ops.MM_DTYPE
            )
            if resblock_ops.transition_supported(
                x.shape, out_ch, self.up, self.fir, self.fir_kernel
            ):
                vs = self.variables["params"]
                temb_proj = (
                    self.act(temb).astype(jnp.float32)
                    @ vs["Dense_0"]["kernel"].astype(jnp.float32)
                    + vs["Dense_0"]["bias"].astype(jnp.float32)
                )
                return resblock_ops.fused_resblock_transition(
                    x, temb_proj,
                    vs["GroupNorm_0"]["scale"], vs["GroupNorm_0"]["bias"],
                    vs["Conv_0"]["kernel"], vs["Conv_0"]["bias"],
                    vs["GroupNorm_1"]["scale"], vs["GroupNorm_1"]["bias"],
                    vs["Conv_1"]["kernel"], vs["Conv_1"]["bias"],
                    vs["Conv_2"]["kernel"][0, 0], vs["Conv_2"]["bias"],
                    up=self.up, fir=self.fir, fir_kernel=self.fir_kernel,
                    num_groups1=min(c // 4, 32),
                    num_groups2=min(out_ch // 4, 32),
                    skip_rescale=self.skip_rescale,
                    mm_dtype=mmdt,
                    act_scales=_static_scales(self, "a1", "a2", None),
                )
            b_, hh_, ww_, _ = x.shape
            hw2 = (hh_ * 2, ww_ * 2) if self.up else (hh_ // 2, ww_ // 2)
            if resblock_ops.supported((b_,) + hw2 + (c,), out_ch):
                h = norm_act(x, self.act)
                res = resample.upsample_2d if self.up else resample.downsample_2d
                naive = (
                    resample.naive_upsample_2d if self.up
                    else resample.naive_downsample_2d
                )
                if self.fir:
                    h = res(h, self.fir_kernel, factor=2)
                    xr = res(x, self.fir_kernel, factor=2)
                else:
                    h = naive(h, factor=2)
                    xr = naive(x, factor=2)
                vs = self.variables["params"]
                temb_proj = (
                    self.act(temb).astype(jnp.float32)
                    @ vs["Dense_0"]["kernel"].astype(jnp.float32)
                    + vs["Dense_0"]["bias"].astype(jnp.float32)
                )
                return resblock_ops.fused_resblock_tail(
                    h, xr, temb_proj,
                    vs["Conv_0"]["kernel"], vs["Conv_0"]["bias"],
                    vs["GroupNorm_1"]["scale"], vs["GroupNorm_1"]["bias"],
                    vs["Conv_1"]["kernel"], vs["Conv_1"]["bias"],
                    vs["Conv_2"]["kernel"][0, 0], vs["Conv_2"]["bias"],
                    num_groups2=min(out_ch // 4, 32),
                    skip_rescale=self.skip_rescale,
                    mm_dtype=(
                        jnp.int8 if layers.CONV3X3_IMPL == "fused_int8"
                        else resblock_ops.MM_DTYPE
                    ),
                    act_scales=_static_scales(self, "a1", "a2", None),
                )

        # int8 inference: fuse quantization into the norm+silu kernel when
        # the output feeds conv3x3 directly (no resampling in between)
        fuse1 = (
            (not train) and not self.up and not self.down
            and layers.int8_conv_fusion_ok(x.shape, out_ch)
        )
        h = norm_act(x, self.act, quantize_out=fuse1)

        if self.up:
            if self.fir:
                h = resample.upsample_2d(h, self.fir_kernel, factor=2)
                x = resample.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_upsample_2d(h, factor=2)
                x = resample.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = resample.downsample_2d(h, self.fir_kernel, factor=2)
                x = resample.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_downsample_2d(h, factor=2)
                x = resample.naive_downsample_2d(x, factor=2)

        if calibrating:
            _sow_amax(self, "a1", h)  # post-resample for transition blocks
        h = conv3x3(h, out_ch, dtype=self.dtype, allow_quantized=not train)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(), dtype=self.dtype)(
                self.act(temb)
            )[:, None, None, :]
        fuse2 = (not train) and layers.int8_conv_fusion_ok(h.shape, out_ch)
        h = norm_act(h, self.act, quantize_out=fuse2)
        if calibrating:
            _sow_amax(self, "a2", h)
        if not fuse2:  # eval-time dropout is the identity; skip under fusion
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            if train:
                h = layers.tag_drop_out(h)
        h = conv3x3(h, out_ch, init_scale=self.init_scale, dtype=self.dtype, allow_quantized=not train)
        if c != out_ch or self.up or self.down:
            if calibrating:
                _sow_amax(self, "x", x)  # post-resample for transition blocks
            x = conv1x1(x, out_ch, dtype=self.dtype)
        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2
