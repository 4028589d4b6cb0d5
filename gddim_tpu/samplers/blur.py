"""Blur-diffusion sampler: DDIM-style order-0 updates in DCT space.

Reference: blur_jax/sampling.py:42-90. All per-step (H, W, 1) mean maps and
std scalars are precomputed on the host and folded into one `lax.scan`; the
inner body is iDCT -> U-Net -> DCT (matmul DCT, gddim_tpu/math/dct.py) plus
elementwise frequency updates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gddim_tpu.math.blur import BlurSDE
from gddim_tpu.samplers.timegrid import rev_time_grid


def blur_order0_stacks(sde: BlurSDE, nfe: int, ts_order: float):
    """Per-step DCT-space coefficients for the order-0 update.

    y_0 = (y - s_i eps) / m_i ;  y_{i+1} = m_{i+1} y_0 + s_{i+1} eps
    folded into  y_{i+1} = a_i y + b_i eps  with
    a_i = m_{i+1}/m_i (H, W, 1),  b_i = s_{i+1} - a_i s_i (H, W, 1 broadcast).
    """
    rev_ts = rev_time_grid(sde.sampling_T, sde.sampling_eps, nfe, ts_order)
    ts = jnp.asarray(rev_ts)
    m = np.asarray(sde.y_mean_coef(ts))  # (N+1, H, W, 1)
    s = np.asarray(sde.y_std_coef(ts))  # (N+1,)
    a = m[1:] / m[:-1]
    b = s[1:, None, None, None] - a * s[:-1, None, None, None]
    return rev_ts, a.astype(np.float32), b.astype(np.float32)


def build_blur_sampler(config, sde: BlurSDE, yeps_apply, data_shape,
                       inverse_scaler, mesh=None):
    """Returns sample_fn(rng, variables, batch_size, u0=None) -> (x, nfe).

    yeps_apply(variables, y, t_vec) -> eps_y (the y-space eps wrapper,
    gddim_tpu/models/wrappers.py:make_blur_yeps_fn). With `mesh`, the batch is
    sharded over the 'data' axis.
    """
    sampling = config.sampling
    nfe = int(sampling.nfe)
    ts_order = float(sampling.ts_order)
    rev_ts, a_stack, b_stack = blur_order0_stacks(sde, nfe, ts_order)

    @partial(jax.jit, donate_argnums=(2,))
    def _run(rng, variables, y0):
        del rng
        batch = y0.shape[0]
        xs = {
            "a": jnp.asarray(a_stack),
            "b": jnp.asarray(b_stack),
            "t": jnp.asarray(rev_ts[:-1], dtype=y0.dtype),
        }

        def body(y, x):
            eps_y = yeps_apply(variables, y, jnp.full((batch,), x["t"], y.dtype))
            y_next = x["a"][None] * y + x["b"][None] * eps_y
            return y_next, None

        y, _ = lax.scan(body, y0, xs)
        x0 = sde.y2x(y)
        return inverse_scaler(x0)

    def sample_fn(rng, variables, batch_size=None, u0=None):
        if u0 is None:
            prior_rng, rng = jax.random.split(rng)
            u0 = sde.prior_sampling(prior_rng, (batch_size,) + tuple(data_shape))
        u0 = _maybe_shard(u0, mesh)
        x = _run(rng, variables, u0)
        return x, nfe

    return sample_fn


def _maybe_shard(u0, mesh):
    if mesh is None:
        return u0
    # P('data') only needs divisibility by the DATA axis (other axes on a
    # multi-axis mesh shard params, not the batch)
    n_data = mesh.shape["data"] if "data" in mesh.axis_names else mesh.devices.size
    if u0.shape[0] % n_data != 0:
        return u0
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(u0, NamedSharding(mesh, P("data")))


def build_blur_deis_sampler(config, sde: BlurSDE, yeps_apply, data_shape,
                            inverse_scaler, mesh=None):
    """Higher-order frequency-space DEIS for blur diffusion.

    New capability over the reference (its scalar multistep module is dead
    code and its sampler dispatch only exposes order0,
    blur_jax/sampling.py:30-39): per-frequency AB coefficients computed on the
    host (gddim_tpu/math/deis_scalar.py) drive the same scan engine shape as
    the CLD samplers, with an (order+1)-deep eps history.
    """
    from gddim_tpu.math.deis_scalar import blur_deis_coef

    sampling = config.sampling
    nfe = int(sampling.nfe)
    order = int(sampling.deis_order)
    ts_order = float(sampling.ts_order)
    rev_ts = rev_time_grid(sde.sampling_T, sde.sampling_eps, nfe, ts_order)
    x_coef, eps_coef = blur_deis_coef(
        sde,
        rev_ts,
        order,
        reference_exact=bool(getattr(sampling, "reference_exact", False)),
    )

    @partial(jax.jit, donate_argnums=(2,))
    def _run(rng, variables, y0):
        del rng
        batch = y0.shape[0]
        xs = {
            "x": jnp.asarray(x_coef, dtype=y0.dtype),  # (N, H, W, 1)
            "eps": jnp.asarray(eps_coef, dtype=y0.dtype),  # (N, o+1, H, W, 1)
            "t": jnp.asarray(rev_ts[:-1], dtype=y0.dtype),
        }
        hist0 = jnp.stack([y0] * max(order, 1)) if order > 0 else None

        def body(carry, x):
            y, hist = carry
            eps_y = yeps_apply(variables, y, jnp.full((batch,), x["t"], y.dtype))
            if hist is not None:
                full = jnp.concatenate([eps_y[None], hist], axis=0)
            else:
                full = eps_y[None]
            # (o+1, 1, H, W, 1) coefficient maps broadcast over batch+channels
            y_new = x["x"][None] * y + jnp.sum(x["eps"][:, None] * full, axis=0)
            new_hist = full[:order] if hist is not None else None
            return (y_new, new_hist), None

        (y, _), _ = lax.scan(body, (y0, hist0), xs)
        return inverse_scaler(sde.y2x(y))

    def sample_fn(rng, variables, batch_size=None, u0=None):
        if u0 is None:
            prior_rng, rng = jax.random.split(rng)
            u0 = sde.prior_sampling(prior_rng, (batch_size,) + tuple(data_shape))
        u0 = _maybe_shard(u0, mesh)
        x = _run(rng, variables, u0)
        return x, nfe

    return sample_fn


def build_blur_sampler_from_config(config, sde, yeps_apply, data_shape,
                                   inverse_scaler, mesh=None):
    name = config.sampling.method.lower()
    if name == "order0":
        return build_blur_sampler(
            config, sde, yeps_apply, data_shape, inverse_scaler, mesh=mesh
        )
    if name == "deis":
        return build_blur_deis_sampler(
            config, sde, yeps_apply, data_shape, inverse_scaler, mesh=mesh
        )
    raise ValueError(f"blur package supports 'order0' and 'deis' (got {name})")
