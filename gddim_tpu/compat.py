"""Reference-API compatibility shims.

Thin aliases mapping the reference's public symbol names
(cld_jax/models/utils.py, cld_jax/sde_lib.py, cld_jax/utils.py) onto the
gddim_tpu equivalents, so code written against the reference finds the same
entry points here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# models/utils.py surface -----------------------------------------------------
from gddim_tpu.models.registry import get_model, register_model  # noqa: F401
from gddim_tpu.models.wrappers import init_model  # noqa: F401
from gddim_tpu.models.wrappers import make_cld_eps_fn, make_cld_score_fn
from gddim_tpu.models.wideresnet import (  # noqa: F401
    create_classifier,
    get_classifier_grad_fn,
    get_logit_fn,
)
from gddim_tpu.train.state import TrainState as State  # noqa: F401

# sde_lib.py surface -----------------------------------------------------------
from gddim_tpu.math.cld import CLD  # noqa: F401
from gddim_tpu.math.cld import CLD as _CLD
from gddim_tpu.math.linalg2 import bmm, inv2 as inv_2x2, sbmm  # noqa: F401
from gddim_tpu.math.variants import (  # noqa: F401
    HostLambdaSDE as LambdaSDE,
    HostLSDE as LSDE,
    HostMLCLD as MLCLD,
)


def from_config(config):
    """CLD factory (reference cld_jax/sde_lib.py:321-331)."""
    return _CLD.from_config(config)


def get_eps_fn(sde, model, params, states, train=False, continuous=True,
               return_state=False):
    """Closure-style eps function (reference models/utils.py:168-182)."""
    eps_apply = make_cld_eps_fn(sde, model, train=train)
    variables = {"params": params, **(states or {})}

    def eps_fn(x, t, rng=None):
        out = eps_apply(variables, x, t, rng=rng)
        if train:
            eps, new_state = out
            return (eps, new_state) if return_state else eps
        return (out, states) if return_state else out

    return eps_fn


def get_score_fn(sde, model, params, states, train=False, continuous=True,
                 return_state=False):
    """Closure-style score function (reference models/utils.py:184-211)."""
    score_apply = make_cld_score_fn(sde, model, train=train)
    variables = {"params": params, **(states or {})}

    def score_fn(x, t, rng=None):
        out = score_apply(variables, x, t, rng=rng)
        if train:
            score, new_state = out
            return (score, new_state) if return_state else score
        return (out, states) if return_state else out

    return score_fn


def get_sigmas(config):
    """SMLD noise scales (reference models/utils.py:69-81)."""
    from gddim_tpu.models.unet import get_sigmas as _g

    return _g(config)


def get_ddpm_params(config):
    """Original-DDPM schedule constants (reference models/utils.py:84-106)."""
    num_diffusion_timesteps = 1000
    beta_start = config.model.beta_min / config.model.num_scales
    beta_end = config.model.beta_max / config.model.num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def to_flattened_numpy(x):
    """(reference models/utils.py:214-216)."""
    return np.asarray(x.reshape(-1))


def from_flattened_numpy(x, shape):
    """(reference models/utils.py:219-221)."""
    return jnp.asarray(x).reshape(shape)


def get_data_shape(config):
    from gddim_tpu.data import get_data_shape as _g

    return _g(config)


def aug_batch(batch):
    """Stack a zero velocity channel (reference cld_jax/utils.py:187-192)."""
    return jnp.stack([batch, jnp.zeros_like(batch)], axis=-1)
