"""Does per-step weight prep cost anything? args-vs-consts forward A/B.

The fused kernels quantize conv weights (abs/max/round/clip/cast over ~100M
params) and build scale rows INSIDE the traced forward. In the NFE sampling
scan those chains are loop-invariant, but XLA's while-loop invariant code
motion is conservative about size-inflating ops, so they may re-run every
step. Closing the jit over the variables turns the whole prep into
compile-time constants (HloConstantFolding) — the time delta between
variables-as-args and variables-as-consts bounds what a once-per-trajectory
prequantization pass would save.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_prequant.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.configs import get_config
from gddim_tpu.math.cld import CLD
from gddim_tpu.models import init_model, make_cld_eps_fn


def build(conv_impl="fused_int8", static=True):
    cfg = get_config("cld/accr_dcifar10")
    cfg.model.dtype = "bfloat16"
    cfg.model.attention_impl = "auto"
    cfg.model.conv_impl = conv_impl
    rng = jax.random.PRNGKey(0)
    model, mstate, params = init_model(rng, cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    variables = {"params": params, **mstate}
    if static:
        from gddim_tpu.models import calibrate as cal

        qs = cal.calibrate_cld_qscales(cfg, model, variables, sde)
        variables = dict(variables, qscales=qs)
    # bf16-cast >=2-D params exactly as bench.py does
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
        else a,
        variables,
    )
    return eps, variables


def total_time(run, args, reps=3):
    _ = float(np.asarray(run(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(eps, variables, B, as_args: bool, k_small=5, k_large=25):
    u0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 32, 32, 3, 2)), jnp.float32
    )
    t = jnp.full((B,), 0.5, jnp.float32)

    def chain(variables, u, k):
        def body(h, _):
            return eps(variables, h, t), None

        h, _ = jax.lax.scan(body, u, None, length=k)
        return h.astype(jnp.float32).mean()

    def run_at(k):
        if as_args:
            return jax.jit(lambda v, u: chain(v, u, k)), (variables, u0)
        return jax.jit(lambda u: chain(variables, u, k)), (u0,)

    ts = total_time(*run_at(k_small))
    tl = total_time(*run_at(k_large))
    return (tl - ts) / (k_large - k_small)


def bench_prep_chain(variables, k_small=8, k_large=64):
    """Time the weight-quantization chain standalone: for every >=2-D conv/NIN
    weight, abs -> per-out-channel max -> div -> round -> clip -> int8 cast.
    This is what the fused kernels' prep_w does in-graph per forward; if
    XLA's WLICM does not hoist it out of the NFE scan, this is the
    per-step cost a once-per-trajectory prequantization removes."""
    leaves = [
        a for a in jax.tree.leaves(variables)
        if hasattr(a, "ndim") and a.ndim >= 2 and a.shape[-1] >= 128
    ]
    n_params = sum(int(np.prod(a.shape)) for a in leaves)

    def prep_all(ws, salt):
        outs = []
        for wm in ws:
            wmf = wm.astype(jnp.float32) + salt  # salt defeats CSE across iters
            axes = tuple(range(wmf.ndim - 1))
            sc = jnp.maximum(jnp.abs(wmf).max(axis=axes), 1e-12) / 127.0
            q = jnp.clip(jnp.round(wmf / sc), -127, 127).astype(jnp.int8)
            outs.append(q.sum(dtype=jnp.int32))
        return jnp.stack(outs).sum()

    def total(k):
        @jax.jit
        def run(ws):
            def body(c, _):
                return c + prep_all(ws, c.astype(jnp.float32) * 0), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=k)
            return c

        _ = int(np.asarray(run(leaves)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(np.asarray(run(leaves)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (total(k_large) - total(k_small)) / (k_large - k_small)
    print(f"prep chain over {len(leaves)} weights ({n_params/1e6:.1f}M params):"
          f" {dt*1e3:7.2f} ms per repetition")
    return dt


def main():
    B = 64
    print(f"backend={jax.default_backend()} B={B} fused_int8 static")
    eps, variables = build()
    bench_prep_chain(variables)
    dt_args = bench(eps, variables, B, as_args=True)
    print(f"variables as jit ARGS  (prep per step):   {dt_args*1e3:7.2f} ms/eval")


if __name__ == "__main__":
    main()
