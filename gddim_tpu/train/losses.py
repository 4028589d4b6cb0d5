"""Score-matching losses.

CLD: the HSM/eps-matching objective (reference cld_jax/losses.py:64-123) —
stack v=0 onto the image batch, draw t ~ U(t_eps, T), full-covariance
perturbation via R(t), and L2 between the model eps and the raw noise.

Blur: same skeleton with the blur forward process and no velocity channel
(reference blur_jax/losses.py:97-104, blur_jax/sde_lib.py:143-144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gddim_tpu.models.wrappers import make_blur_eps_fn, make_cld_eps_fn

T_EPS = 1e-5  # smallest training time (reference losses.py:64 t_eps)


def _reduce(losses, reduce_mean: bool):
    flat = losses.reshape(losses.shape[0], -1)
    if reduce_mean:
        return flat.mean(axis=-1)
    return 0.5 * flat.sum(axis=-1)


def make_cld_loss_fn(sde, model, train: bool, reduce_mean: bool = True,
                     likelihood_weighting: bool = False):
    if likelihood_weighting:
        raise RuntimeError  # parity: reference losses.py:112-113
    eps_apply = make_cld_eps_fn(sde, model, train=train)

    def loss_fn(rng, params, states, batch):
        images = batch["image"]
        data = jnp.stack([images, jnp.zeros_like(images)], axis=-1)
        rng, t_rng = jax.random.split(rng)
        t = jax.random.uniform(
            t_rng, (data.shape[0],), minval=T_EPS, maxval=sde.T
        )
        rng, perturb_rng = jax.random.split(rng)
        perturbed, _, z = sde.perturb_data(data, t, perturb_rng)
        rng, drop_rng = jax.random.split(rng)
        variables = {"params": params, **states}
        if train:
            eps, new_state = eps_apply(variables, perturbed, t, rng=drop_rng)
        else:
            eps = eps_apply(variables, perturbed, t)
            new_state = states
        losses = _reduce(jnp.square(eps - z), reduce_mean)
        loss = losses.mean()
        return loss, ({"score_loss": loss}, new_state)

    return loss_fn


def make_blur_loss_fn(sde, model, train: bool, reduce_mean: bool = True):
    eps_apply = make_blur_eps_fn(sde, model, train=train)

    def loss_fn(rng, params, states, batch):
        data = batch["image"]
        rng, t_rng = jax.random.split(rng)
        t = sde.sample_t((data.shape[0],), t_rng)
        rng, perturb_rng = jax.random.split(rng)
        perturbed, _, z = sde.perturb_data(data, t, perturb_rng)
        rng, drop_rng = jax.random.split(rng)
        variables = {"params": params, **states}
        if train:
            eps, new_state = eps_apply(variables, perturbed, t, rng=drop_rng)
        else:
            eps = eps_apply(variables, perturbed, t)
            new_state = states
        losses = _reduce(jnp.square(eps - z), reduce_mean)
        loss = losses.mean()
        return loss, ({"score_loss": loss}, new_state)

    return loss_fn
