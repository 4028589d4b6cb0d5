"""Base layers for the score U-Nets.

Fresh flax.linen implementations with the reference's semantics (citations:
cld_jax/models/layers.py, layerspp.py). Class/param naming deliberately tracks
the reference's auto-numbered `nn.compact` layout so legacy msgpack
checkpoints can be mapped onto the new param tree.

TPU-first notes: convolutions run in NHWC (TPU-native layout); a `dtype`
argument threads a bf16 compute path through every block while parameters and
normalization statistics stay float32.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def default_init(scale: float = 1.0):
    """DDPM variance-scaling init (layers.py:496-501 of the reference)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


# 3x3-conv implementation selector, read at trace time: 'xla' (default) or
# 'pallas' (gddim_tpu/ops/conv3x3.py, used when the shape qualifies). Set via
# config.model.conv_impl (consumed by NCSNpp) or directly for benchmarks.
CONV3X3_IMPL = "xla"

# training-path whole-block fusion selector (config.model.fused_train):
# when True, eligible residual blocks run the fused bf16 Pallas forward with
# an XLA-recomputed backward (ops/resblock.py:make_fused_resblock_train).
# Independent of CONV3X3_IMPL (which governs inference kernels).
FUSED_TRAIN = False


class QuantizedActivation(NamedTuple):
    """Per-sample-quantized activation flowing between fused kernels:
    value ~= q * scale[:, None, None, None]. Produced by norm_act(...,
    quantize_out=True); consumed (without an extra HBM quantize pass) by the
    Conv int8 path, dequantized transparently anywhere else."""

    q: Any  # (B, H, W, C) int8
    scale: Any  # (B,) f32

    @property
    def shape(self):
        return self.q.shape

    def dequant(self, dtype=jnp.bfloat16):
        srow = self.scale.reshape((-1,) + (1,) * (self.q.ndim - 1))
        return (self.q.astype(jnp.float32) * srow).astype(dtype)


class Conv(nn.Module):
    """nn.Conv-compatible conv (same 'kernel'/'bias' params and scope name
    'Conv_k') with an optional Pallas 3x3 fast path."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    use_bias: bool = True
    kernel_dilation: tuple = (1, 1)
    kernel_init: Any = None
    dtype: Any = None
    # gate for the int8 inference path: int8 rounding has zero gradient, so
    # callers must assert they are NOT differentiating through this conv
    # (the model blocks pass allow_quantized=not train)
    allow_quantized: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        q_in = x if isinstance(x, QuantizedActivation) else None
        if q_in is not None:
            x = q_in.q  # shapes/dtype decisions below use the int8 carrier
        kernel = self.param(
            "kernel",
            self.kernel_init or default_init(),
            (kh, kw, x.shape[-1], self.features),
        )
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        impl = CONV3X3_IMPL
        qualifies = False
        if impl == "int8" and not self.allow_quantized:
            impl = "xla"  # training-safe fallback
        if impl in ("pallas", "int8") and (kh, kw) == (3, 3):
            from gddim_tpu.ops import conv3x3 as c3

            qualifies = c3.supported(
                x.shape, kernel.shape, self.strides[0], self.kernel_dilation[0]
            )
        if qualifies and impl == "int8":
            # inference-only quantized path: per-SAMPLE dynamic activation
            # scales, per-channel weight scales, fused dequant+bias epilogue.
            # Quantization happens in-graph on the f32 params (negligible next
            # to the conv itself; weights constant-fold under the scan). A
            # QuantizedActivation input (from a fused norm_act) skips the
            # standalone quantize pass entirely.
            from gddim_tpu.ops.conv3x3 import conv3x3_pallas_int8, quantize_per_sample

            w32 = kernel.astype(jnp.float32)
            sw = jnp.maximum(jnp.abs(w32).max(axis=(0, 1, 2)), 1e-12) / 127.0
            w8 = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8)
            if q_in is not None:
                x8, sx = q_in.q, q_in.scale
            else:
                x8, sx = quantize_per_sample(x)
            bias = None
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out_dtype = self.dtype or (x.dtype if q_in is None else jnp.bfloat16)
            return conv3x3_pallas_int8(
                x8, w8, sw, sx, bias=bias, out_dtype=out_dtype,
            )
        if q_in is not None:
            # quantized input but no int8 conv for this shape: dequantize
            x = q_in.dequant(self.dtype or jnp.bfloat16)
        if qualifies and impl == "pallas":
            from gddim_tpu.ops.conv3x3 import conv3x3_pallas

            y = conv3x3_pallas(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                self.strides,
                "SAME",
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # tag for selective rematerialization (model.remat='convs'): the
        # save_only_these_names policy keeps conv outputs resident and
        # recomputes only the cheap norm/activation chain in the backward
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, "conv_out")
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.dtype is not None:
                b = b.astype(self.dtype)
            y = y + b
        return y


def conv3x3(x, out_planes, stride=1, bias=True, dilation=1, init_scale=1.0,
            dtype=None, allow_quantized=False):
    """3x3 conv with DDPM init (reference ddpm_conv3x3, layers.py:138-151)."""
    return Conv(
        out_planes,
        kernel_size=(3, 3),
        strides=(stride, stride),
        use_bias=bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=default_init(init_scale),
        dtype=dtype,
        allow_quantized=allow_quantized,
    )(x)


def conv1x1(x, out_planes, stride=1, bias=True, dilation=1, init_scale=1.0, dtype=None):
    """1x1 conv with DDPM init (reference ddpm_conv1x1, layers.py:106-116).

    Uses the same custom Conv module as conv3x3 so the shared 'Conv_k'
    auto-numbering matches the reference's nn.Conv sequence exactly.
    """
    return Conv(
        out_planes,
        kernel_size=(1, 1),
        strides=(stride, stride),
        use_bias=bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=default_init(init_scale),
        dtype=dtype,
    )(x)


class NIN(nn.Module):
    """1x1 dense mix over channels (reference layers.py:467-478)."""

    num_units: int
    init_scale: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_dim = int(x.shape[-1])
        w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        if self.dtype is not None:
            w, b = w.astype(self.dtype), b.astype(self.dtype)
        y = jnp.einsum("...i,ij->...j", x, w) + b
        return y


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier time embeddings (reference layerspp.py:33-43)."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W", nn.initializers.normal(stddev=self.scale), (self.embedding_size,)
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def get_timestep_embedding(timesteps, embedding_dim, max_positions=10000):
    """Sinusoidal positional embedding (reference layers.py:450-464)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [[0, 0], [0, 1]])
    return emb


def get_act(config):
    """Activation from config (reference layers.py:30-42)."""
    name = config.model.nonlinearity.lower()
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return nn.swish
    raise NotImplementedError(f"activation {name} unknown")


class Combine(nn.Module):
    """Combine skip-pyramid information (reference layerspp.py:46-58)."""

    method: str = "cat"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        h = conv1x1(x, y.shape[-1], dtype=self.dtype)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"combine method {self.method} not recognized")


class GroupNorm(nn.Module):
    """GroupNorm with optionally fused SiLU (Pallas kernel on TPU).

    Drop-in replacement for nn.GroupNorm: same class name (so auto-numbered
    scopes match the reference checkpoints), same 'scale'/'bias' params, f32
    statistics. With fuse_silu, norm+activation run in one VMEM pass
    (gddim_tpu/ops/groupnorm.py).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    fuse_silu: bool = False
    quantize_out: bool = False  # emit QuantizedActivation (int8 inference)

    @nn.compact
    def __call__(self, x):
        from gddim_tpu.ops.groupnorm import group_norm_silu, group_norm_silu_quant

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if x.ndim == 4 and self.quantize_out:
            q, s = group_norm_silu_quant(
                x, scale, bias, self.num_groups, self.epsilon, self.fuse_silu
            )
            return QuantizedActivation(q, s)
        if x.ndim == 4:
            return group_norm_silu(
                x, scale, bias, self.num_groups, self.epsilon, self.fuse_silu
            )
        # non-image inputs: plain XLA path
        from gddim_tpu.ops.groupnorm import group_norm_silu_reference

        shape = x.shape
        x4 = x.reshape(shape[0], 1, -1, c)
        out = group_norm_silu_reference(
            x4, scale, bias, self.num_groups, self.epsilon, self.fuse_silu
        )
        return out.reshape(shape)


def group_norm(x, num_groups=None, name=None):
    """GroupNorm in f32 regardless of activation dtype (min(C//4, 32) groups)."""
    c = x.shape[-1]
    if num_groups is None:
        num_groups = min(c // 4, 32)
    return GroupNorm(num_groups=num_groups, name=name)(x)


def norm_act(x, act, num_groups=None, quantize_out=False):
    """GroupNorm followed by the activation; fused into one kernel when the
    activation is SiLU/swish (all reference configs). With quantize_out (int8
    inference, output feeding a 3x3 conv directly) the fused kernel emits a
    QuantizedActivation so the activated tensor never round-trips HBM in bf16.
    """
    c = x.shape[-1]
    if num_groups is None:
        num_groups = min(c // 4, 32)
    if act is nn.swish:
        return GroupNorm(
            num_groups=num_groups, fuse_silu=True,
            quantize_out=bool(quantize_out),
        )(x)
    return act(GroupNorm(num_groups=num_groups)(x))


def tag_drop_out(h):
    """Tag a post-dropout activation for the selective remat policy: saving
    it keeps the dropout mask's effect resident, so the backward recompute
    skips the GN2+SiLU+dropout chain AND its PRNG bits (measured: dropout
    mask generation is ~19% of the training step under full recompute)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(h, "drop_out")


def int8_conv_fusion_ok(x_shape, out_ch: int) -> bool:
    """True when a norm_act -> conv3x3 pair can run the fused int8 pipeline."""
    if CONV3X3_IMPL != "int8":
        return False
    from gddim_tpu.ops import conv3x3 as c3

    return c3.supported(x_shape, (3, 3, x_shape[-1], out_ch), 1, 1)
