"""Sampler factory: config -> jitted sampling function.

Mirrors the reference dispatch surface (cld_jax/sampling.py:41-154): the nine
sampler families {order0, deis, hybdeis, mldeis, sdeis, ldeis, ode, sscs, em}
behind one `build_cld_sampler(config, sde, eps_apply, data_shape,
inverse_scaler)`. All scan-based samplers share the engine in engine.py; `ode`
is a host-driven scipy `solve_ivp` around a jitted drift (reference parity:
sampling.py:432-495).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.math.cld import CLD
from gddim_tpu.math.linalg2 import sbmm
from gddim_tpu.samplers import coefs
from gddim_tpu.samplers.engine import ab_sample, sscs_sample

# eps_apply(variables, u, t_vec) -> eps ; variables = {'params': ..., ...}
EpsApply = Callable


def _bundle_from_config(host, sampling) -> "coefs.ABBundle | coefs.SSCSBundle":
    name = sampling.method.lower()
    nfe = int(sampling.nfe)
    denoising = bool(sampling.noise_removal)
    ts_order = float(sampling.ts_order)
    order = int(sampling.deis_order)
    ref_exact = bool(getattr(sampling, "reference_exact", False))
    if name == "deis":
        return coefs.deis_bundle(host, nfe, order, ts_order, denoising)
    if name == "hybdeis":
        return coefs.hybdeis_bundle(
            host,
            nfe,
            order,
            ts_order,
            float(sampling.noise_nfe_ratio),
            float(sampling.img_t_ratio),
            denoising,
            reference_exact=ref_exact,
        )
    if name == "order0":
        return coefs.order0_bundle(host, nfe, denoising, bool(sampling.is_em))
    if name == "mldeis":
        return coefs.mldeis_bundle(host, nfe, order, ts_order, denoising)
    if name == "ldeis":
        return coefs.ldeis_bundle(host, nfe, order, ts_order, denoising)
    if name == "sdeis":
        return coefs.sdeis_bundle(
            host,
            nfe,
            order,
            float(sampling.lambda_coef),
            bool(sampling.sdeis_use_order0),
            ts_order,
            denoising,
            reference_exact=ref_exact,
        )
    if name == "em":
        return coefs.em_bundle(
            host, nfe, float(sampling.lambda_coef), ts_order, denoising
        )
    if name == "sscs":
        return coefs.sscs_bundle(host, nfe, ts_order, denoising)
    raise ValueError(f"unknown sampler method: {name}")


CLD_SAMPLERS = (
    "order0",
    "deis",
    "hybdeis",
    "mldeis",
    "sdeis",
    "ldeis",
    "ode",
    "sscs",
    "em",
)


def build_cld_sampler(
    config,
    sde: CLD,
    eps_apply: EpsApply,
    data_shape: tuple,
    inverse_scaler: Callable = lambda x: x,
    mesh=None,
):
    """Returns sample_fn(rng, variables, batch_size, u0=None) -> (x, v, nfe).

    The returned function jit-compiles one scan program per batch shape and
    reuses it across calls (compilation is cached by JAX on shape/dtype).
    With `mesh`, the sample batch is sharded over the mesh 'data' axis and the
    whole NFE scan runs data-parallel across chips (the TPU-native version of
    the reference's pmapped psampler, cld_jax/sampling.py:194-200).
    """
    sampling = config.sampling
    name = sampling.method.lower()
    host = sde.host()

    if name == "ode":
        return _build_ode_sampler(config, sde, eps_apply, data_shape, inverse_scaler)

    bundle = _bundle_from_config(host, sampling)
    nfe = bundle.nfe
    is_sscs = isinstance(bundle, coefs.SSCSBundle)

    @partial(jax.jit, donate_argnums=(2,))
    def _run(rng, variables, u0):
        batch = u0.shape[0]

        def eps_fn(u, t):
            return eps_apply(variables, u, jnp.full((batch,), t, dtype=u.dtype))

        if is_sscs:
            u = sscs_sample(eps_fn, u0, bundle, rng)
        else:
            u = ab_sample(eps_fn, u0, bundle, rng)
        x, v = u[..., 0], u[..., 1]
        return inverse_scaler(x), v

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
        # P('data') only needs the batch divisible by the DATA axis — on a
        # multi-axis (data, fsdp, model) mesh the other axes shard params,
        # not the batch.
        n_data = (
            mesh.shape["data"] if "data" in mesh.axis_names
            else mesh.devices.size
        )

    def sample_fn(rng, variables, batch_size=None, u0=None):
        if u0 is None:
            prior_rng, rng = jax.random.split(rng)
            u0 = sde.prior_sampling(prior_rng, (batch_size,) + tuple(data_shape))
        if mesh is not None and u0.shape[0] % n_data == 0:
            u0 = jax.device_put(u0, batch_sharding)
        x, v = _run(rng, variables, u0)
        return x, v, nfe

    return sample_fn


def _build_ode_sampler(config, sde, eps_apply, data_shape, inverse_scaler):
    """Black-box probability-flow ODE via scipy (cld_jax/sampling.py:432-495)."""
    from scipy import integrate

    sampling = config.sampling
    rtol = float(getattr(sampling, "rtol", 1e-5))
    atol = float(getattr(sampling, "atol", 1e-5))
    method = str(getattr(sampling, "ode_method", "RK45"))
    denoising = bool(sampling.noise_removal)
    host = sde.host()
    dn = coefs._denoise_consts(host) if denoising else None

    @jax.jit
    def drift_fn(variables, u, t):
        batch = u.shape[0]
        eps = eps_apply(variables, u, jnp.full((batch,), t, dtype=u.dtype))
        score = sde.eps2score(eps, jnp.full((batch,), t, dtype=u.dtype))
        f = sde.F(t)
        g = sde.G(t)
        return sbmm(f, u) - 0.5 * sbmm(g @ g, score)

    @jax.jit
    def denoise_fn(variables, u):
        batch = u.shape[0]
        t = jnp.full((batch,), dn.t, dtype=u.dtype)
        eps = eps_apply(variables, u, t)
        score = sde.eps2score(eps, t)
        dt = -dn.eps
        return (
            u
            + sbmm(jnp.asarray(dn.F, dtype=u.dtype), u) * dt
            - sbmm(jnp.asarray(dn.GG, dtype=u.dtype), score) * dt
        )

    def sample_fn(rng, variables, batch_size=None, u0=None):
        if u0 is None:
            prior_rng, rng = jax.random.split(rng)
            u0 = sde.prior_sampling(prior_rng, (batch_size,) + tuple(data_shape))
        d_shape = u0.shape

        def ode_func(t, flat):
            u = jnp.asarray(flat.reshape(d_shape), dtype=jnp.float32)
            return np.asarray(drift_fn(variables, u, t), dtype=np.float64).reshape(-1)

        solution = integrate.solve_ivp(
            ode_func,
            (sde.T, sde.sampling_eps),
            np.asarray(u0, dtype=np.float64).reshape(-1),
            rtol=rtol,
            atol=atol,
            method=method,
        )
        nfe = int(solution.nfev)
        u = jnp.asarray(solution.y[:, -1].reshape(d_shape), dtype=jnp.float32)
        if dn is not None:
            u = denoise_fn(variables, u)
            nfe += 1
        x, v = u[..., 0], u[..., 1]
        return inverse_scaler(x), v, nfe

    return sample_fn
