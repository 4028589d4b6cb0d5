"""Measure what the per-sample dynamic amax reductions inside the fused
int8 kernels actually cost: time the flagship forward with the stock
_quant_2d vs a fixed-scale variant (scale precision is irrelevant for
timing). The delta bounds the win of calibrated static activation scales."""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 25


def build():
    from gddim_tpu.configs import get_config
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import init_model, make_cld_eps_fn

    cfg = get_config("cld/accr_dcifar10")
    cfg.model.dtype = "bfloat16"
    cfg.model.attention_impl = "auto"
    cfg.model.conv_impl = "fused_int8"
    rng = jax.random.PRNGKey(0)
    model, mstate, params = init_model(rng, cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    variables = {"params": params, **mstate}
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
        else a,
        variables,
    )
    return eps, variables


def bench(eps, variables, B=64, reps=4):
    u0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 32, 32, 3, 2)), jnp.float32
    )
    t = jnp.full((B,), 0.5, jnp.float32)

    @jax.jit
    def run(variables, u):
        def body(h, _):
            return eps(variables, h, t), None

        h, _ = jax.lax.scan(body, u, None, length=K)
        return h.astype(jnp.float32).mean()

    _ = float(np.asarray(run(variables, u0)))
    t0 = time.time()
    outs = [run(variables, u0) for _ in range(reps)]
    _ = float(np.asarray(outs[-1]))
    return (time.time() - t0) / (reps * K)


def main():
    from gddim_tpu.ops import attnblock, resblock

    eps, variables = build()
    dt = bench(eps, variables)
    print(f"dynamic per-sample scales: {dt*1e3:7.2f} ms/eval ({64/dt:7.1f} img/s)", flush=True)

    def fixed_quant(a):
        s = jnp.float32(0.05)
        q = jnp.clip(jnp.round(a * (1.0 / s)), -127, 127).astype(jnp.int8)
        return q, s

    old_r, old_a = resblock._quant_2d, attnblock._quant_2d
    try:
        resblock._quant_2d = fixed_quant
        attnblock._quant_2d = fixed_quant
        eps2, variables2 = build()
        dt2 = bench(eps2, variables2)
        print(f"fixed (static) scales:     {dt2*1e3:7.2f} ms/eval ({64/dt2:7.1f} img/s)", flush=True)
    finally:
        resblock._quant_2d, attnblock._quant_2d = old_r, old_a
    print(f"amax-reduction share: {(dt-dt2)/dt*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
