"""Flagship training-step throughput + MFU on the real chip.

Methodology per PERF.md: n_jitted_steps scanned INSIDE one jit (the tunnel
costs ~1.1 ms/dispatch), sync by fetching the in-graph scalar loss. FLOPs
are exact from XLA cost_analysis on the compiled step. MFU is reported
against the chip's verified bf16 matmul peak (175 TF/s, PERF.md round-4
peak matrix) and the v5e nominal 197 TF/s.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/bench_train.py [cfgs...]
  cfg = dtype[,remat][,b<batch>]   e.g. bf16,remat,b128
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 8  # n_jitted_steps per dispatch
# round-4 peak verification (PERF.md): bf16 ~175 TF/s across sizes, windows,
# layouts and sessions (round 2/3's 159 was a low-session reading)
MEASURED_PEAK = 175e12
NOMINAL_PEAK = 197e12
FWD_GFLOP_PER_IMG = 34.75  # exact, XLA cost_analysis on the eps fn (PERF.md)


def build(dtype: str, remat, batch: int, dropout=None, grad_only=False,
          fused_train=False, fwd_only=False, no_attn=False, family="cld"):
    from functools import partial

    from gddim_tpu.configs import get_config
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import init_model
    from gddim_tpu.train import create_train_state, make_cld_loss_fn, make_train_step

    cfg = get_config(
        "cld/accr_dcifar10" if family == "cld" else "blur/ddpm_deep_cifar10"
    )
    cfg.model.dtype = dtype
    cfg.model.remat = remat
    cfg.training.n_jitted_steps = STEPS
    cfg.training.batch_size = batch
    if dropout is not None:
        cfg.model.dropout = dropout
    cfg.model.fused_train = fused_train
    if no_attn:
        # decomposition mode: delete the attention blocks (fwd AND their
        # VJPs) to attribute their share of the step
        cfg.model.attn_resolutions = ()
    # same PRNG the production train loop uses (run_lib.train); override
    # with JAX_DEFAULT_PRNG_IMPL or config for A/B
    import os

    if "JAX_DEFAULT_PRNG_IMPL" not in os.environ:
        jax.config.update(
            "jax_default_prng_impl",
            str(getattr(cfg.training, "prng_impl", "rbg")),
        )
    rng = jax.random.PRNGKey(0)
    model, mstate, params = init_model(rng, cfg)
    state = create_train_state(jax.random.PRNGKey(1), cfg, params, mstate)
    if family == "cld":
        sde = CLD.from_config(cfg)
        loss_fn = make_cld_loss_fn(sde, model, train=True)
    else:
        from gddim_tpu.math import blur as blur_lib
        from gddim_tpu.train import make_blur_loss_fn

        sde = blur_lib.from_config(cfg)
        loss_fn = make_blur_loss_fn(sde, model, train=True)
    if fwd_only:
        # decomposition mode: scanned loss VALUE only (no grad, no update) —
        # the training forward's share of the step under the same config
        import jax as _jax
        from jax import lax

        @_jax.jit
        def step(st, batches):
            def one(carry, b):
                rng_c = carry
                rng_c, sr = _jax.random.split(rng_c)
                loss, (info, _) = loss_fn(sr, st.params, st.model_state, b)
                return rng_c, info
            _, infos = lax.scan(one, st.rng, batches)
            return st, _jax.tree.map(jnp.mean, infos)
    elif grad_only:
        # decomposition mode: value_and_grad of the loss, scanned, but NO
        # optimizer update / EMA / state rebuild — isolates fwd+bwd cost
        import jax as _jax
        from jax import lax

        @_jax.jit
        def step(st, batches):
            def one(carry, b):
                rng_c = carry
                rng_c, sr = _jax.random.split(rng_c)
                (loss, (info, _)), grads = _jax.value_and_grad(
                    loss_fn, argnums=1, has_aux=True
                )(sr, st.params, st.model_state, b)
                # fold the grad tree into a scalar so nothing is DCE'd
                gsum = sum(
                    _jax.tree.leaves(_jax.tree.map(lambda g: g.sum(), grads))
                )
                info = dict(info, score_loss=info["score_loss"] + 0 * gsum)
                return rng_c, info
            _, infos = lax.scan(one, st.rng, batches)
            return st, _jax.tree.map(jnp.mean, infos)
    else:
        step = make_train_step(cfg, loss_fn, mesh=None)
    batch_data = {
        "image": jnp.asarray(
            np.random.default_rng(0).normal(size=(STEPS, batch, 32, 32, 3)),
            jnp.float32,
        )
    }
    return step, state, batch_data


def bench(step, state, batch_data, reps=3):
    new_state, info = step(state, batch_data)
    _ = float(np.asarray(info["score_loss"]))
    t0 = time.time()
    st = state
    for _ in range(reps):
        st, info = step(st, batch_data)
    _ = float(np.asarray(info["score_loss"]))
    dt = (time.time() - t0) / (reps * STEPS)
    return dt


def main():
    cfgs = sys.argv[1:] or [
        "bf16,b128",
        "bf16,remat,b128",
        "bf16,sremat,b128",
        "bf16,sremat,b256",
    ]
    for spec in cfgs:
        parts = spec.split(",")
        dtype = {"f32": "float32", "bf16": "bfloat16"}[parts[0]]
        # sremat = selective: save conv+dropout outputs, recompute norm/act
        # lremat = lean selective: conv outputs only (fits larger batches)
        remat = (
            "convs" if "sremat" in parts
            else "convs_lean" if "lremat" in parts
            else ("remat" in parts)
        )
        batch = next(
            (int(p[1:]) for p in parts if p.startswith("b") and p[1:].isdigit()), 64
        )
        dropout = 0.0 if "nodrop" in parts else None
        grad_only = "gradonly" in parts
        # fusedfwd = model.fused_train: fused bf16 Pallas block forward with
        # XLA-recomputed backward (custom_vjp) — usually run with remat OFF,
        # since the custom_vjp already keeps block interiors out of HBM
        family = "blur" if "blur" in parts else "cld"
        fused_train = "fusedfwd" in parts
        fwd_only = "fwdonly" in parts
        no_attn = "noattn" in parts
        # fusedbwd / nofusedbwd: pin the Pallas block-backward policy for
        # this spec (ops/resblock_bwd.py; default follows GDDIM_FUSED_BWD)
        import os as _os

        if "fusedbwd" in parts:
            _os.environ["GDDIM_FUSED_BWD"] = "1"
        elif "nofusedbwd" in parts:
            _os.environ["GDDIM_FUSED_BWD"] = "0"
        try:
            step, state, batch_data = build(
                dtype, remat, batch, dropout=dropout, grad_only=grad_only,
                fused_train=fused_train, fwd_only=fwd_only, no_attn=no_attn,
                family=family,
            )
            dt = bench(step, state, batch_data)
        except Exception as e:
            print(f"{spec}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        finally:
            # compiled executables + their baked device buffers accumulate
            # across configs in one process and OOM the chip — drop them
            import gc

            step = state = batch_data = None
            jax.clear_caches()
            gc.collect()
        # Analytic model FLOPs (XLA's cost_analysis on the scanned dispatch
        # under-reports — the while-loop body is counted once and scaled
        # inconsistently across backends, measured 8x off on axon): the
        # standard fwd+bwd convention is 3x the forward cost; remat adds one
        # more forward (4x). MFU here counts ONLY useful model flops, so the
        # remat recompute does not inflate it.
        if family == "cld":
            useful = 3.0 * FWD_GFLOP_PER_IMG * 1e9 * batch
            tfs = useful / dt / 1e12
            mfu_txt = (
                f"{tfs:6.1f} TF/s(useful)  MFU {tfs*1e12/MEASURED_PEAK*100:4.1f}% "
                f"of measured ({tfs*1e12/NOMINAL_PEAK*100:4.1f}% of nominal)"
            )
        else:  # blur model FLOPs differ; report throughput only
            tfs = 0.0
            mfu_txt = "(blur: no exact FLOP constant - img/s only)"
        print(
            f"{spec}: {dt*1e3:7.2f} ms/step  {batch/dt:7.1f} img/s  {mfu_txt}",
            flush=True,
        )
        # driver-visible regression record (committed after real-TPU runs):
        # one JSONL row per spec, appended — the analysis compares the
        # latest row per spec against history. Decomposition rows (fwdonly/
        # gradonly/noattn/nodrop) are diagnostics, not configs — keep them
        # out of the per-spec history.
        if fwd_only or grad_only or no_attn or dropout is not None:
            continue
        import json
        from pathlib import Path

        art = Path(__file__).parent.parent / "artifacts" / "bench_train.jsonl"
        art.parent.mkdir(exist_ok=True)
        with art.open("a") as fh:
            fh.write(json.dumps({
                "spec": spec,
                "ms_per_step": round(dt * 1e3, 2),
                "img_per_s": round(batch / dt, 1),
                "useful_mfu_measured_peak": (
                    round(tfs * 1e12 / MEASURED_PEAK, 4) if tfs else None
                ),
                "backend": jax.default_backend(),
            }) + "\n")


if __name__ == "__main__":
    main()
