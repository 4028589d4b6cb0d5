"""Micro-ablation of the flagship eps forward pass on the real chip.

Times one NCSN++ eps evaluation under each implementation toggle to locate
the hot spots (FIR impl, attention impl, GroupNorm fusion, dtype, batch).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x))


def time_forward(config, batch: int, reps: int = 10) -> float:
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import init_model, make_cld_eps_fn

    rng = jax.random.PRNGKey(0)
    model, ms, params = init_model(rng, config)
    sde = CLD.from_config(config)
    eps_apply = jax.jit(make_cld_eps_fn(sde, model, train=False))
    variables = {"params": params, **ms}
    u = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3, 2))
    t = jnp.full((batch,), 0.5, jnp.float32)
    sync(eps_apply(variables, u, t))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = eps_apply(variables, u, t)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from gddim_tpu.configs import get_config
    from gddim_tpu.models import resample

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, nargs="+", default=[64, 256])
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args()

    cases = [
        # (label, dtype, attention, fir_impl)
        ("ref-style      f32 einsum5d chanbatch", "float32", "einsum5d", "channel_batch"),
        ("f32 xla-attn sep-fir               ", "float32", "xla", "separable"),
        ("bf16 xla-attn sep-fir              ", "bfloat16", "xla", "separable"),
        ("bf16 pallas-attn sep-fir           ", "bfloat16", "pallas", "separable"),
    ]
    for batch in args.batch:
        for label, dtype, attn, fir in cases:
            config = get_config("cld/accr_dcifar10")
            config.model.dtype = dtype
            config.model.attention_impl = attn
            resample.FIR_IMPL = fir
            try:
                dt = time_forward(config, batch, args.reps)
                print(
                    f"batch={batch:4d} {label}: {dt*1000:8.2f} ms "
                    f"({batch/dt:8.1f} img/s fwd)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"batch={batch:4d} {label}: FAILED {type(e).__name__} {e}")
            finally:
                resample.FIR_IMPL = "separable"


if __name__ == "__main__":
    main()
