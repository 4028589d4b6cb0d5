"""Flagship forward throughput: K=25 chained eps evaluations inside ONE jit
(the tunnel costs ~1.1ms per dispatch, so per-op timing lies)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.configs import get_config
from gddim_tpu.math.cld import CLD
from gddim_tpu.models import init_model, make_cld_eps_fn

K = 25


def build(conv_impl, dtype):
    cfg = get_config("cld/accr_dcifar10")
    cfg.model.dtype = dtype
    cfg.model.attention_impl = "auto"
    cfg.model.conv_impl = conv_impl
    rng = jax.random.PRNGKey(0)
    model, mstate, params = init_model(rng, cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    variables = {"params": params, **mstate}
    return eps, variables


def bench(eps, variables, B, reps=3, k_small=5, k_large=25):
    """Delta-K differencing: per-dispatch tunnel overhead is variable (up to
    ~24 ms measured); (T(k_large)-T(k_small))/(k_large-k_small) removes it."""
    u0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 32, 32, 3, 2)), jnp.float32
    )
    t = jnp.full((B,), 0.5, jnp.float32)

    def total(k):
        @jax.jit
        def run(variables, u):
            def body(h, _):
                e = eps(variables, h, t)  # same shape as u: chain directly
                return e, None

            h, _ = jax.lax.scan(body, u, None, length=k)
            return h.astype(jnp.float32).mean()  # scalar: 4 bytes fetched

        _ = float(np.asarray(run(variables, u0)))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            _ = float(np.asarray(run(variables, u0)))
            ts.append(time.time() - t0)
        return min(ts)

    return (total(k_large) - total(k_small)) / (k_large - k_small)


def main():
    import sys
    impls = sys.argv[1:] or ["xla", "pallas"]
    for conv_impl in impls:
        eps, variables = build(conv_impl, "bfloat16")
        for B in (64, 256):
            dt = bench(eps, variables, B)
            print(
                f"conv={conv_impl} bf16 B={B}: {dt*1e3:7.2f} ms/eval "
                f"{B/dt:8.1f} img/s  ~{B*40.0/dt/1e3:5.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
