"""FIR up/down-sampling (StyleGAN2-style) built TPU-first.

Reference semantics: cld_jax/models/up_or_down_sampling.py (upfirdn_2d pipeline
of zero-insert -> pad -> FIR filter -> decimate, plus the fused
upsample-conv / conv-downsample variants). The reference lowers the FIR step
by folding channels into the batch and convolving with a single-channel kernel
(up_or_down_sampling.py:276-291) — hostile to TPU layouts. Here the whole
upfirdn pipeline is expressed as *one* `lax.conv_general_dilated` per spatial
axis: `lhs_dilation` performs the zero-insert upsample, `window_strides` the
decimation, explicit padding the crop, and the separable FIR tap runs as a
depthwise (feature_group_count=C) conv in native NHWC.

Numerical parity with the reference pipeline is exact (same taps, same pad
arithmetic); see tests/test_resample.py.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.models.layers import default_init


def _fir_taps(k) -> np.ndarray:
    """Normalize a 1-D FIR kernel: k / sum(k) per axis (2-D norm = product)."""
    k = np.asarray(k, dtype=np.float32)
    assert k.ndim == 1
    return k / k.sum()


# Implementation selector for benchmarking: 'separable' (TPU-native, default)
# or 'channel_batch' (the reference's fold-channels-into-batch single-channel
# conv, up_or_down_sampling.py:276-291) so bench.py can measure the x1
# baseline on identical numerics.
FIR_IMPL = "separable"

# Fuse the FIR filter into the neighboring conv kernel for the fused
# resample ops (one strided MXU conv instead of depthwise FIR + conv).
FUSE_FIR_CONV = True


def _compose_shift_tensor(kw: int, k1d: np.ndarray) -> np.ndarray:
    """S[d, e, x, y] = k_flipped[x - d, y - e]: places the (flipped) 2-D FIR
    tap at every conv-kernel offset, so the composed kernel is
    K[x, y, i, o] = sum_{d,e} w[d, e, i, o] * S[d, e, x, y] (full correlation
    composition). Host-side constant per (conv size, FIR taps)."""
    kf = k1d.shape[0]
    k2d = np.outer(k1d, k1d)
    k_fl = k2d[::-1, ::-1]
    out = kw + kf - 1
    s = np.zeros((kw, kw, out, out), dtype=np.float32)
    for d in range(kw):
        for e in range(kw):
            s[d, e, d : d + kf, e : e + kf] = k_fl
    return s


def _channel_batch_fir(x, k1d, up, down, pad0, pad1, gain):
    """Reference-style upfirdn: channels into batch, one 2-D single-channel
    conv per image (hostile to TPU; kept for baseline measurement)."""
    n, h, w, c = x.shape
    k2d = jnp.asarray(np.outer(k1d, k1d) * gain, dtype=x.dtype)
    y = x
    # zero-insert upsample
    if up > 1:
        y = y.reshape(n, h, 1, w, 1, c)
        y = jnp.pad(y, [(0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)])
        y = y.reshape(n, h * up, w * up, c)
    y = jnp.pad(y, [(0, 0), (pad0, pad1), (pad0, pad1), (0, 0)])
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(n * c, 1, y.shape[1], y.shape[2])
    w_k = k2d[::-1, ::-1][:, :, None, None]
    y = jax.lax.conv_general_dilated(
        y, w_k, (1, 1), "VALID", dimension_numbers=("NCHW", "HWIO", "NCHW")
    )
    y = y.reshape(n, c, y.shape[2], y.shape[3]).transpose(0, 2, 3, 1)
    return y[:, ::down, ::down, :]


def _sep_fir(x, k1d: np.ndarray, up: int, down: int, pad0: int, pad1: int, gain: float):
    """upfirdn along H then W with a separable FIR kernel, depthwise.

    Equivalent to the reference upfirdn_2d(x, outer(k,k)*gain, up, down,
    pad0, pad1) — the trailing (up-1) zeros the reference's reshape-upsample
    appends are folded into the right padding.
    """
    if FIR_IMPL == "channel_batch":
        return _channel_batch_fir(x, k1d, up, down, pad0, pad1, gain)
    c = x.shape[-1]
    dtype = x.dtype
    # reference convolves with the flipped kernel; keep the flip for generality
    taps = jnp.asarray(k1d[::-1].copy(), dtype=dtype)
    kh = taps.shape[0]
    pad = (pad0, pad1 + up - 1)

    kern_h = jnp.tile(taps.reshape(kh, 1, 1, 1), (1, 1, 1, c)) * gain
    x = jax.lax.conv_general_dilated(
        x,
        kern_h,
        window_strides=(down, 1),
        padding=(pad, (0, 0)),
        lhs_dilation=(up, 1),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    kern_w = jnp.tile(taps.reshape(1, kh, 1, 1), (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x,
        kern_w,
        window_strides=(1, down),
        padding=((0, 0), pad),
        lhs_dilation=(1, up),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return x


def upsample_2d(x, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    """FIR upsample (reference up_or_down_sampling.py:333-369)."""
    k1d = _fir_taps(k)
    p = k1d.shape[0] - factor
    return _sep_fir(
        x,
        k1d,
        up=factor,
        down=1,
        pad0=(p + 1) // 2 + factor - 1,
        pad1=p // 2,
        gain=gain * (factor**2),
    )


def downsample_2d(x, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    """FIR downsample (reference up_or_down_sampling.py:372-411)."""
    k1d = _fir_taps(k)
    p = k1d.shape[0] - factor
    return _sep_fir(
        x, k1d, up=1, down=factor, pad0=(p + 1) // 2, pad1=p // 2, gain=gain
    )


def upsample_conv_2d(x, w, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    """Fused zero-insert upsample + conv + FIR (reference :89-165).

    The reference spatially flips + channel-swaps the kernel and calls
    `conv_transpose(transpose_kernel=True)` (up_or_down_sampling.py:139-158);
    those two transforms cancel, so the net op is a single input-dilated
    correlation with `w` and full (k-1) padding — one fused XLA conv.
    """
    kh, kw, in_c, out_c = w.shape
    assert kh == kw
    assert x.shape[-1] == in_c, "grouped fused resample not supported"
    k1d = _fir_taps(k)
    p = (k1d.shape[0] - factor) - (kw - 1)
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2 + 1
    if FUSE_FIR_CONV and FIR_IMPL == "separable":
        # compose conv kernel and FIR taps into one (kw+kf-1)^2 kernel: a
        # single input-dilated MXU conv replaces conv + 2 depthwise FIR passes
        s = jnp.asarray(
            _compose_shift_tensor(kw, k1d) * (gain * factor**2), jnp.float32
        )
        kern = jnp.einsum(
            "deio,dexy->xyio", w.astype(jnp.float32), s,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(w.dtype)
        pad = ((kh - 1 + pad0, kh - 1 + pad1), (kw - 1 + pad0, kw - 1 + pad1))
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(factor, factor),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    x = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _sep_fir(
        x,
        k1d,
        up=1,
        down=1,
        pad0=pad0,
        pad1=pad1,
        gain=gain * (factor**2),
    )


def conv_downsample_2d(x, w, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    """Fused FIR + conv + decimate (reference :168-209)."""
    kh, kw, in_c, _ = w.shape
    assert kh == kw
    assert x.shape[-1] == in_c, "grouped fused resample not supported"
    k1d = _fir_taps(k)
    p = (k1d.shape[0] - factor) + (kw - 1)
    pad0, pad1 = (p + 1) // 2, p // 2
    if FUSE_FIR_CONV and FIR_IMPL == "separable":
        # single strided conv with the FIR-composed kernel
        s = jnp.asarray(_compose_shift_tensor(kw, k1d) * gain, jnp.float32)
        kern = jnp.einsum(
            "deio,dexy->xyio", w.astype(jnp.float32), s,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(w.dtype)
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(factor, factor),
            padding=((pad0, pad1), (pad0, pad1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    x = _sep_fir(x, k1d, up=1, down=1, pad0=pad0, pad1=pad1, gain=gain)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def naive_upsample_2d(x, factor: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x, factor: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


class Conv2d(nn.Module):
    """Conv with optional fused FIR up/downsampling (reference :40-73).

    Param names ('weight', 'bias') match the reference for checkpoint parity.
    """

    fmaps: int
    kernel: int
    up: bool = False
    down: bool = False
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    kernel_init: Optional[Any] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        init = self.kernel_init or default_init()
        w = self.param(
            "weight", init, (self.kernel, self.kernel, x.shape[-1], self.fmaps)
        )
        if self.dtype is not None:
            w = w.astype(self.dtype)
        if self.up:
            x = upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            x = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            if self.dtype is not None:
                b = b.astype(self.dtype)
            x = x + b.reshape((1, 1, 1, -1))
        return x
