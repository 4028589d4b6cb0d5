"""Model plumbing: init, eps/score wrappers, channel stacking.

Parity targets (cld_jax/models/utils.py):
- (x, v) channel interleave "b ... d g -> b ... (g d)" in and out (:141-164)
- time conditioning labels = t * 999 (:172)
- mixed-score analytic term  eps = model_out + invR(t) @ [0, v]  (:168-182)
- score = eps2score(eps)  (:184-211)

The blur package's adapter hooks (encode_t/encode_x/model2eps,
blur_jax/models/utils.py:140-160) are covered by the BlurSDE methods and the
blur wrapper below.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp

from gddim_tpu.math.linalg2 import bmm, inv2
from gddim_tpu.models.registry import get_model


def init_model(rng, config):
    """Initialize the configured model (reference models/utils.py:109-125)."""
    model_def = functools.partial(get_model(config.model.name), config=config)
    if "ps" in config.data.dataset.lower():
        input_shape = (2, config.data.dim * 2)
    else:
        ch = config.data.num_channels * (2 if _is_cld(config) else 1)
        input_shape = (2, config.data.image_size, config.data.image_size, ch)
    fake_input = jnp.zeros(input_shape)
    fake_label = jnp.ones(input_shape[:1])
    params_rng, dropout_rng = jax.random.split(rng)
    model = model_def()
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, fake_input, fake_label
    )
    init_model_state, initial_params = flax.core.pop(variables, "params")
    return model, init_model_state, initial_params


def _is_cld(config) -> bool:
    return str(getattr(config, "sde", "cld")).lower() == "cld"


def stack_uv_to_channels(u):
    """(B, ..., d, 2) -> (B, ..., 2d) with [x-channels | v-channels] order
    (einops "b ... d g -> b ... (g d)", reference :153)."""
    moved = jnp.moveaxis(u, -1, -2)  # (..., 2, d)
    return moved.reshape(u.shape[:-2] + (2 * u.shape[-2],))


def unstack_channels_to_uv(h):
    """(B, ..., 2d) -> (B, ..., d, 2) inverse of stack_uv_to_channels."""
    d = h.shape[-1] // 2
    split = h.reshape(h.shape[:-1] + (2, d))  # (..., 2, d)
    return jnp.moveaxis(split, -2, -1)


def make_cld_eps_fn(sde, model, train: bool = False):
    """eps_apply(variables, u, t_vec[, rng]) for the CLD score model.

    variables: {'params': params, **model_state}. u: (B, ..., d, 2).
    """

    def eps_apply(variables, u, t_vec, rng=None, mutable=False):
        labels = t_vec * 999.0
        x_in = stack_uv_to_channels(u)
        if train:
            out, new_state = model.apply(
                variables,
                x_in,
                labels,
                train=True,
                mutable=list(k for k in variables if k != "params"),
                rngs={"dropout": rng} if rng is not None else None,
            )
        else:
            out = model.apply(variables, x_in, labels, train=False, mutable=False)
            new_state = None
        eps = unstack_channels_to_uv(out)
        if sde.mixed_score:
            # analytic mixed-score term: invR(t) @ [0, v] (reference :175-176)
            u_v_only = u.at[..., 0].set(0.0)
            eps = eps + bmm(inv2(sde.R(t_vec)), u_v_only)
        if train or mutable:
            return eps, new_state
        return eps

    return eps_apply


def make_cld_score_fn(sde, model, train: bool = False):
    eps_apply = make_cld_eps_fn(sde, model, train=train)

    def score_apply(variables, u, t_vec, rng=None):
        out = eps_apply(variables, u, t_vec, rng)
        eps = out[0] if train else out
        score = sde.eps2score(eps, t_vec)
        return (score, out[1]) if train else score

    return score_apply


def make_blur_eps_fn(sde, model, train: bool = False):
    """eps_apply for the blur model: plain channels, SDE adapter hooks
    (blur_jax/models/utils.py:140-153)."""

    def eps_apply(variables, x, t_vec, rng=None):
        labels = sde.encode_t(t_vec)
        x_in = sde.encode_x(x)
        if train:
            out, new_state = model.apply(
                variables,
                x_in,
                labels,
                train=True,
                mutable=list(k for k in variables if k != "params"),
                rngs={"dropout": rng} if rng is not None else None,
            )
            return sde.model2eps(x, t_vec, out), new_state
        out = model.apply(variables, x_in, labels, train=False, mutable=False)
        return sde.model2eps(x, t_vec, out)

    return eps_apply


def make_blur_yeps_fn(sde, model, train: bool = False):
    """y-space eps: iDCT -> model -> DCT (blur_jax/models/utils.py:155-160)."""
    xeps = make_blur_eps_fn(sde, model, train=train)

    def yeps_apply(variables, y, t_vec, rng=None):
        out = xeps(variables, sde.y2x(y), t_vec, rng)
        if train:
            eps, state = out
            return sde.x2y(eps), state
        return sde.x2y(out)

    return yeps_apply
