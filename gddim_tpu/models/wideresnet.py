"""Noise-conditional WideResNet-28-10 classifier.

Used by the reference for class-conditional sampling experiments
(cld_jax/models/wideresnet_noise_conditional.py:297-322, loaded by
models/utils.py:224-287). Fresh linen implementation: per-image
standardization, Gaussian-Fourier noise conditioning injected per block,
identity+zero-pad skips, kaiming-fan-out conv init.

Checkpoint-compatible with the reference: despite its filename's "bn"
scope names, the reference normalizes with GroupNorm too
(wideresnet_noise_conditional.py:203-207 — its shake-shake/shake-drop
helpers are dead code inherited from the forked autoaugment file). Module
scope names (`init_bn`, `bn_2`, `pre-pool-bn`, `conv1`, `conv2`), GroupNorm
epsilon (1e-5) and group counts match the reference parameter tree exactly
(asserted by tests/test_param_tree_parity.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.models.layers import GaussianFourierProjection
from gddim_tpu.models.registry import register_model

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _dense_init(key, shape, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(shape[-1])
    return jax.random.uniform(key, shape, dtype, -scale, scale)


class WideResnetBlock(nn.Module):
    channels: int
    strides: Tuple[int, int] = (1, 1)
    activate_before_residual: bool = False

    @nn.compact
    def __call__(self, x, temb, train=True):
        def norm_relu(h, name):
            # reference `activation` (:203-207): GroupNorm(eps=1e-5,
            # groups=min(C//4, 32)) + relu, with explicit scope names
            return nn.relu(
                nn.GroupNorm(
                    num_groups=min(h.shape[-1] // 4, 32), epsilon=1e-5,
                    name=name,
                )(h)
            )

        if self.activate_before_residual:
            x = norm_relu(x, "init_bn")
            orig = x
        else:
            orig = x
            x = norm_relu(x, "init_bn")

        x = nn.Conv(
            self.channels, (3, 3), self.strides, padding="SAME",
            kernel_init=_conv_init, use_bias=False, name="conv1",
        )(x)
        x = x + nn.Dense(self.channels)(nn.swish(temb))[:, None, None, :]
        x = norm_relu(x, "bn_2")
        x = nn.Conv(
            self.channels, (3, 3), padding="SAME",
            kernel_init=_conv_init, use_bias=False, name="conv2",
        )(x)

        if orig.shape != x.shape:
            orig = nn.avg_pool(orig, self.strides, self.strides)
            pad = x.shape[-1] - orig.shape[-1]
            orig = jnp.pad(orig, [(0, 0), (0, 0), (0, 0), (0, pad)])
        return x + orig


class WideResnetGroup(nn.Module):
    blocks_per_group: int
    channels: int
    strides: Tuple[int, int] = (1, 1)
    activate_before_residual: bool = False

    @nn.compact
    def __call__(self, x, temb, train=True):
        for i in range(self.blocks_per_group):
            x = WideResnetBlock(
                self.channels,
                self.strides if i == 0 else (1, 1),
                activate_before_residual=self.activate_before_residual and not i,
            )(x, temb, train)
        return x


@register_model(name="wideresnet_noise_conditional")
class WideResnet(nn.Module):
    """WideResNet classifier conditioned on the noise level."""

    blocks_per_group: int = 4
    channel_multiplier: int = 10
    num_outputs: int = 10
    config: object = None  # registry-compat; unused

    @nn.compact
    def __call__(self, x, sigmas, train=True):
        n = np.prod(x.shape[1:])
        x = (x - jnp.mean(x, axis=(1, 2, 3), keepdims=True)) / jnp.maximum(
            jnp.std(x, axis=(1, 2, 3), keepdims=True), 1.0 / np.sqrt(n)
        )
        temb = GaussianFourierProjection(embedding_size=128, scale=16)(
            jnp.log(sigmas)
        )
        temb = nn.Dense(128 * 4)(temb)
        temb = nn.Dense(128 * 4)(nn.swish(temb))

        x = nn.Conv(
            16, (3, 3), padding="SAME", name="init_conv",
            kernel_init=_conv_init, use_bias=False,
        )(x)
        x = WideResnetGroup(
            self.blocks_per_group, 16 * self.channel_multiplier,
            activate_before_residual=True,
        )(x, temb, train)
        x = WideResnetGroup(
            self.blocks_per_group, 32 * self.channel_multiplier, (2, 2)
        )(x, temb, train)
        x = WideResnetGroup(
            self.blocks_per_group, 64 * self.channel_multiplier, (2, 2)
        )(x, temb, train)
        x = nn.relu(
            nn.GroupNorm(
                num_groups=min(x.shape[-1] // 4, 32), epsilon=1e-5,
                name="pre-pool-bn",
            )(x)
        )
        x = nn.avg_pool(x, x.shape[1:3])
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.num_outputs, kernel_init=_dense_init)(x)


def create_classifier(rng, batch_size: int, ckpt_path: str | None = None):
    """Build (and optionally restore) the classifier
    (parity: cld_jax/models/utils.py:224-247)."""
    classifier = WideResnet(blocks_per_group=4, channel_multiplier=10, num_outputs=10)
    variables = classifier.init(
        {"params": rng},
        jnp.ones((batch_size, 32, 32, 3)),
        jnp.ones((batch_size,)),
        train=False,
    )
    params = variables["params"]
    if ckpt_path:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(ckpt_path, params)
    return classifier, params


def get_logit_fn(classifier, classifier_params):
    """(parity: cld_jax/models/utils.py:250-272)."""
    image_mean = jnp.asarray([[[0.49139968, 0.48215841, 0.44653091]]])
    image_std = jnp.asarray([[[0.24703223, 0.24348513, 0.26158784]]])

    def logit_fn(data, ve_noise_scale):
        data = (data - image_mean[None]) / image_std[None]
        return classifier.apply(
            {"params": classifier_params}, data, ve_noise_scale, train=False
        )

    return logit_fn


def get_classifier_grad_fn(logit_fn):
    """Gradient of class log-probability for classifier guidance
    (parity: cld_jax/models/utils.py:275-287)."""

    def grad_fn(data, ve_noise_scale, labels):
        def prob_fn(d):
            logits = logit_fn(d, ve_noise_scale)
            return (
                jax.nn.log_softmax(logits, axis=-1)[
                    jnp.arange(labels.shape[0]), labels
                ].sum()
            )

        return jax.grad(prob_fn)(data)

    return grad_fn
