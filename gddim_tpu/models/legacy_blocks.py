"""NCSNv1/v2-era layer library (RefineNet blocks + legacy DDPM layers).

Inventory parity with the reference's layers.py (cld_jax/models/layers.py:
CRP/RCU/MSF/Refine blocks :117-341 including the noise-conditional NCSNv1
Cond* variants :135-310, legacy AttnBlock/Upsample/Downsample/
ResnetBlockDDPM :496-568, ncsn conv initializers :45-104). These are unused by
the NCSN++ production configs but are part of the model-zoo surface; fresh
implementations of the standard RefineNet components (Lin et al. 2017) in
linen, NHWC. The conditional variants take the per-sample noise-level index
y and thread it through a conditional normalizer (e.g.
ConditionalInstanceNorm2dPlus, models/normalization.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gddim_tpu.models.layers import NIN, conv3x3, default_init


def ncsn_conv_init(scale: float = 1.0):
    """PyTorch-style conv init used by NCSNv1/v2 (reference layers.py:45-48)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale / 3.0, "fan_in", "uniform")


def ncsn_conv(x, features, kernel=3, stride=1, bias=True, dilation=1, init_scale=1.0):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=ncsn_conv_init(init_scale),
    )(x)


class CRPBlock(nn.Module):
    """Chained residual pooling (reference layers.py:117-145)."""

    features: int
    n_stages: int
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = nn.max_pool(
                path, window_shape=(5, 5), strides=(1, 1), padding="SAME"
            )
            path = ncsn_conv(path, self.features, bias=False)
            x = x + path
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (reference layers.py:183-211)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv(x, self.features, bias=False)
            x = x + residual
        return x


def _msf_resize(h, shape, interpolation):
    if interpolation not in ("bilinear", "nearest_neighbor"):
        raise ValueError(f"Interpolation {interpolation} does not exist!")
    method = "bilinear" if interpolation == "bilinear" else "nearest"
    return jax.image.resize(
        h, (h.shape[0], shape[0], shape[1], h.shape[-1]), method
    )


class MSFBlock(nn.Module):
    """Multi-scale fusion: project + resize + sum (reference layers.py:246-277)."""

    features: int
    shape: Sequence[int]  # target (H, W)
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs):
        total = None
        for x in xs:
            h = ncsn_conv(x, self.features, bias=True)
            h = _msf_resize(h, self.shape, self.interpolation)
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: per-input RCU, MSF fusion (skipped for the start
    block, which takes its single RCU output as-is), CRP, output RCU
    (reference layers.py:309-341)."""

    features: int
    shape: Sequence[int]
    act: Any = nn.relu
    interpolation: str = "bilinear"
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs):
        hs = [
            RCUBlock(x.shape[-1], n_blocks=2, n_stages=2, act=self.act)(x)
            for x in xs
        ]
        if not self.start:
            h = MSFBlock(self.features, self.shape, self.interpolation)(hs)
        else:
            h = hs[0]
        h = CRPBlock(self.features, n_stages=2, act=self.act)(h)
        return RCUBlock(
            self.features, n_blocks=3 if self.end else 1, n_stages=2, act=self.act
        )(h)


class CondCRPBlock(nn.Module):
    """Noise-conditional chained residual pooling, NCSNv1 (reference
    layers.py:135-151). Differs from CRPBlock in two ways beyond the
    normalizer: the pool is AVERAGE (not max), and each stage normalizes
    its path before pooling."""

    features: int
    n_stages: int
    normalizer: Any  # nn.Module factory taking (x, y)
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = self.normalizer()(path, y)
            path = nn.avg_pool(
                path, window_shape=(5, 5), strides=(1, 1), padding="SAME"
            )
            path = ncsn_conv(path, self.features, bias=False)
            x = x + path
        return x


class CondRCUBlock(nn.Module):
    """Noise-conditional residual conv unit, NCSNv1 (reference
    layers.py:173-191): each stage runs normalizer -> act -> conv."""

    features: int
    n_blocks: int
    n_stages: int
    normalizer: Any
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x, y):
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.normalizer()(x, y)
                x = self.act(x)
                x = ncsn_conv(x, self.features, bias=False)
            x = x + residual
        return x


class CondMSFBlock(nn.Module):
    """Noise-conditional multi-scale fusion, NCSNv1 (reference
    layers.py:217-241): normalize each input before its projection."""

    features: int
    shape: Sequence[int]
    normalizer: Any
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs, y):
        total = None
        for x in xs:
            h = self.normalizer()(x, y)
            h = ncsn_conv(h, self.features, bias=True)
            h = _msf_resize(h, self.shape, self.interpolation)
            total = h if total is None else total + h
        return total


class CondRefineBlock(nn.Module):
    """Noise-conditional RefineNet block, NCSNv1 (reference
    layers.py:271-310): the conditional composition of the blocks above,
    with the same start/end structure as RefineBlock."""

    features: int
    shape: Sequence[int]
    normalizer: Any
    act: Any = nn.relu
    interpolation: str = "bilinear"
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs, y):
        hs = [
            CondRCUBlock(
                x.shape[-1], n_blocks=2, n_stages=2,
                normalizer=self.normalizer, act=self.act,
            )(x, y)
            for x in xs
        ]
        if not self.start:
            h = CondMSFBlock(
                self.features, self.shape, self.normalizer, self.interpolation
            )(hs, y)
        else:
            h = hs[0]
        h = CondCRPBlock(
            self.features, n_stages=2, normalizer=self.normalizer, act=self.act
        )(h, y)
        return CondRCUBlock(
            self.features, n_blocks=3 if self.end else 1, n_stages=2,
            normalizer=self.normalizer, act=self.act,
        )(h, y)


class LegacyAttnBlock(nn.Module):
    """Channel-wise self-attention, DDPM-era (reference layers.py:504-522)."""

    @nn.compact
    def __call__(self, x):
        from gddim_tpu.ops.attention import self_attention_2d

        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(c // 4, 32))(x)
        q = NIN(c)(h)
        k = NIN(c)(h)
        v = NIN(c)(h)
        h = self_attention_2d(q, k, v, impl="xla")
        h = NIN(c, init_scale=0.0)(h)
        return x + h


class LegacyUpsample(nn.Module):
    """(reference layers.py:525-538)"""

    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        if self.with_conv:
            y = conv3x3(y, c)
        return y


class LegacyDownsample(nn.Module):
    """(reference layers.py:541-552)"""

    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.with_conv:
            y = conv3x3(x, c, stride=2)
        else:
            y = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        assert y.shape == (b, h // 2, w // 2, c)
        return y


class LegacyResnetBlockDDPM(nn.Module):
    """Original DDPM res-block (reference layers.py:555-568)."""

    act: Any
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, temb=None, train=True):
        c = x.shape[-1]
        out_ch = self.out_ch or c
        h = self.act(nn.GroupNorm(num_groups=min(c // 4, 32))(x))
        h = conv3x3(h, out_ch)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init())(self.act(temb))[
                :, None, None, :
            ]
        h = self.act(nn.GroupNorm(num_groups=min(out_ch // 4, 32))(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = conv3x3(h, out_ch, init_scale=0.0)
        if c != out_ch:
            if self.conv_shortcut:
                x = conv3x3(x, out_ch)
            else:
                x = NIN(out_ch)(x)
        return x + h
