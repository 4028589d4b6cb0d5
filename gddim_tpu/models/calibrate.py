"""Static activation-scale calibration for the fused int8 inference path.

The fused kernels (ops/resblock.py, ops/attnblock.py) quantize activations
per-sample by default, paying an amax reduction per quant site per block
(~7% of the flagship forward, PERF.md). Quant sites sitting after a
GroupNorm (or a softmax-convex combination) have nearly input-independent
amplitudes — a calibrated per-site static scale loses very little fidelity
there and removes the in-kernel amax work. The conv1x1-skip sites see
PRE-norm, input-dependent activations: the model never applies static
scales to them (models/blocks.py passes sx=None; the kernels run those
projections per-sample in bf16). The "x" amaxes sown here are therefore
unused by default — kept for callers who opt into fully-static kernels.

Calibration runs the UNFUSED path (the fused dispatch gates itself off when
the 'qscales' collection is mutable, gddim_tpu/models/blocks.py) over a sweep
of sampling timesteps, folding the per-site activation amax into a 'qscales'
variable collection. At inference, merging {'qscales': ...} into the model
variables switches the fused int8 kernels to the static path automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.models.wrappers import stack_uv_to_channels


def _fold_max(a, b):
    return jax.tree.map(jnp.maximum, a, b) if a is not None else b


def calibrate_cld_qscales(config, model, variables, sde, batch: int = 8,
                          nfe: int = 12, seed: int = 0):
    """Calibrate quant-site scales along an actual CLD sampling trajectory.

    Runs an order-0 exact-ODE trajectory (coefs.order0_bundle) with the
    unfused bf16 path, capturing per-site amax at every step — so the scales
    cover the full range of sampling-time activations, not one timestep.
    Returns the 'qscales' collection (merge as variables | {'qscales': ...}).
    """
    from gddim_tpu.math.linalg2 import sbmm
    from gddim_tpu.samplers import coefs

    host = sde.host()
    bundle = coefs.order0_bundle(host, nfe, denoising=False, is_em=False)
    stack = jnp.asarray(bundle.stack, jnp.float32)  # (N, 2, 2, 2)
    ts = np.asarray(bundle.rev_ts[:-1], np.float32)

    s = config.data.image_size
    rng = jax.random.PRNGKey(seed)
    u = sde.prior_sampling(rng, (batch, s, s, config.data.num_channels))

    @jax.jit
    def step(variables, u, coef, t):
        # variables travel as a jit ARG (closing over the param tree would
        # bake it into the HLO as constants; see __graft_entry__.py)
        x_in = stack_uv_to_channels(u)
        labels = jnp.full((u.shape[0],), t, jnp.float32) * 999.0
        out, mut = model.apply(
            variables, x_in, labels, train=False, mutable=["qscales"]
        )
        from gddim_tpu.models.wrappers import unstack_channels_to_uv

        eps = unstack_channels_to_uv(out)
        if sde.mixed_score:
            from gddim_tpu.math.linalg2 import bmm, inv2

            u_v_only = u.at[..., 0].set(0.0)
            tv = jnp.full((u.shape[0],), t, jnp.float32)
            eps = eps + bmm(inv2(sde.R(tv)), u_v_only)
        u_next = sbmm(coef[0], u) + sbmm(coef[1], eps)
        return u_next, mut["qscales"]

    qscales = None
    for i in range(stack.shape[0]):
        u, qs = step(variables, u, stack[i], ts[i])
        qscales = _fold_max(qscales, qs)
    return jax.tree.map(jnp.asarray, qscales)


def calibrate_blur_qscales(config, model, variables, sde, batch: int = 8,
                           nfe: int = 12, seed: int = 0):
    """Blur-family analogue: order-0 DCT-space trajectory with capture."""
    from gddim_tpu.samplers.blur import blur_order0_stacks

    rev_ts, a_stack, b_stack = blur_order0_stacks(sde, nfe, ts_order=2.0)
    s = config.data.image_size
    rng = jax.random.PRNGKey(seed)
    y = sde.prior_sampling(rng, (batch, s, s, config.data.num_channels))

    @jax.jit
    def step(variables, y, a, b, t):
        tv = jnp.full((y.shape[0],), t, jnp.float32)
        x = sde.y2x(y)
        labels = sde.encode_t(tv)
        out, mut = model.apply(
            variables, sde.encode_x(x), labels, train=False, mutable=["qscales"]
        )
        eps = sde.model2eps(x, tv, out)
        eps_y = sde.x2y(eps)
        return a[None] * y + b[None] * eps_y, mut["qscales"]

    qscales = None
    for i in range(a_stack.shape[0]):
        y, qs = step(
            variables, y, jnp.asarray(a_stack[i]), jnp.asarray(b_stack[i]),
            np.float32(rev_ts[i]),
        )
        qscales = _fold_max(qscales, qs)
    return jax.tree.map(jnp.asarray, qscales)
