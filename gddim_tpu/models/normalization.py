"""Normalization layer zoo (reference: cld_jax/models/normalization.py).

The production configs only use GroupNorm (accr_dcifar10_config.py:28), but
the reference exposes the NCSNv1/v2-era variants behind `get_normalization`;
kept for config-surface parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def get_normalization(config, conditional: bool = False):
    """Normalization selector (reference normalization.py:23-41)."""
    norm = config.model.normalization
    if conditional:
        if norm == "InstanceNorm++":
            return ConditionalInstanceNorm2dPlus
        raise NotImplementedError(f"{norm} not implemented conditionally.")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        return nn.GroupNorm
    raise NotImplementedError(f"normalization {norm} not implemented")


class VarianceNorm2d(nn.Module):
    """Variance-only normalization (reference normalization.py:44-61)."""

    bias: bool = False

    @staticmethod
    def scale_init(key, shape, dtype=jnp.float32):
        # reference normalization.py:48-52: normal(0.02) jitter around 1
        return nn.initializers.normal(0.02)(key, shape, dtype) + 1.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", VarianceNorm2d.scale_init, (1, 1, 1, c))
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        out = scale * h
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, c))
            out = out + bias
        return out


class InstanceNorm2d(nn.Module):
    """Per-channel instance normalization (reference normalization.py:64-84)."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, 1, c))
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
            out = out + beta
        return out


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ — adds the mean-of-means correction channelwise
    (reference normalization.py:87-114)."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_plus = (means - m) / jnp.sqrt(v + 1e-5)  # (B, C)
        mean = means[:, None, None, :]
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        h = h + means_plus[:, None, None, :] * self.param(
            "alpha", _noisy_ones, (1, 1, 1, c)
        )
        gamma = self.param("gamma", _noisy_ones, (1, 1, 1, c))
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (reference normalization.py:117-145)."""

    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_plus = (means - m) / jnp.sqrt(v + 1e-5)
        h = (x - means[:, None, None, :]) / jnp.sqrt(
            jnp.var(x, axis=(1, 2), keepdims=True) + 1e-5
        )
        n_out = 3 * c if self.bias else 2 * c
        embed = nn.Embed(
            self.num_classes, n_out,
            embedding_init=nn.initializers.normal(0.02),
        )(y)
        if self.bias:
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
        else:
            gamma, alpha = jnp.split(embed, 2, axis=-1)
            beta = 0.0
        out = (
            (gamma + 1.0)[:, None, None, :] * h
            + means_plus[:, None, None, :] * alpha[:, None, None, :]
        )
        if self.bias:
            out = out + beta[:, None, None, :]
        return out


def _noisy_ones(key, shape):
    import jax

    return jnp.ones(shape) + 0.02 * jax.random.normal(key, shape)
