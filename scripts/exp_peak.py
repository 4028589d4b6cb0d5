"""Chip peak verification matrix (round-4 verdict #3).

The whole speed-of-light argument in PERF.md rests on the measured peaks
(bf16 159 TF/s, int8 252 TOP/s from a single 8192^3 probe). v5e-class chips
are typically specified near ~197 TF/s bf16 / ~394 TOP/s int8 — if 20% of
the measured gap is probe artifact, the ceiling (and the "5x impossible"
claim) shifts. This varies the probe across:

  - matmul sizes 4096..16384 (square and tall-M),
  - chain depths (two delta-K windows, cross-checked),
  - operand layouts (contract lhs dim 1 vs dim 0; rhs dim 0 vs dim 1),
  - bf16 and int8, with the epilogue minimized (bf16 chains need none;
    int8 chains use a single truncating cast).

All timings via delta-K differencing inside single dispatches
(scripts/_timing.per_app_seconds).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds


def _dev_normal(key, shape, dtype, scale=1.0):
    """Operand created ON DEVICE: the tunnel moves host arrays at ~30 MB/s,
    so a 128-512 MB closure constant or host transfer stalls for minutes."""
    return jax.jit(
        lambda: (jax.random.normal(jax.random.PRNGKey(key), shape) * scale).astype(dtype)
    )()


def _dev_randint(key, shape, lo, hi, dtype):
    return jax.jit(
        lambda: jax.random.randint(jax.random.PRNGKey(key), shape, lo, hi).astype(dtype)
    )()


def bf16_rate(m, k, n, layout="nn", k_small=16, k_large=128, reps=3):
    # unit-scale weights keep the chain bounded with zero epilogue work
    wshape = (n, k) if layout in ("nt", "tt") else (k, n)
    w = _dev_normal(0, wshape, jnp.bfloat16, scale=1.0 / np.sqrt(k))
    dims_rhs = ((1,), ()) if layout in ("nt", "tt") else ((0,), ())
    contract_lhs = (0,) if layout in ("tn", "tt") else (1,)

    def f(x):
        y = jax.lax.dot_general(
            x, w, ((contract_lhs, dims_rhs[0]), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        # keep the chain type-stable: output is (m, n) or (n, m); transpose-free
        # chaining only works for square nn, so restrict layouts to square shapes
        return y

    x0 = _dev_normal(1, (m, k), jnp.bfloat16)
    dt = per_app_seconds(f, x0, k_small=k_small, k_large=k_large, reps=reps)
    tf = 2 * m * k * n / dt / 1e12
    print(
        f"bf16 {layout} M={m:6d} K={k:6d} N={n:6d} win=({k_small},{k_large}):"
        f" {dt*1e3:8.3f} ms  {tf:6.1f} TF/s",
        flush=True,
    )
    return tf


def int8_rate(m, k, n, k_small=16, k_large=128, reps=3):
    w = _dev_randint(0, (k, n), -3, 4, jnp.int8)

    def f(x):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.astype(jnp.int8)  # minimal epilogue: one truncating cast

    x0 = _dev_randint(1, (m, k), -3, 4, jnp.int8)
    dt = per_app_seconds(f, x0, k_small=k_small, k_large=k_large, reps=reps)
    tops = 2 * m * k * n / dt / 1e12
    print(
        f"int8 nn M={m:6d} K={k:6d} N={n:6d} win=({k_small},{k_large}):"
        f" {dt*1e3:8.3f} ms  {tops:6.1f} TOP/s",
        flush=True,
    )
    return tops


def main():
    print("== bf16 size sweep (nn layout) ==", flush=True)
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192), (16384, 8192, 8192)]:
        bf16_rate(m, k, n)
    print("\n== bf16 chain-depth cross-check at 8192^3 ==", flush=True)
    bf16_rate(8192, 8192, 8192, k_small=8, k_large=64)
    bf16_rate(8192, 8192, 8192, k_small=32, k_large=256)
    print("\n== bf16 operand layouts at 8192^3 ==", flush=True)
    for layout in ["nn", "nt", "tn", "tt"]:
        bf16_rate(8192, 8192, 8192, layout=layout)
    print("\n== int8 size sweep ==", flush=True)
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192), (16384, 8192, 8192)]:
        int8_rate(m, k, n)
    print("\n== int8 chain-depth cross-check at 8192^3 ==", flush=True)
    int8_rate(8192, 8192, 8192, k_small=8, k_large=64)
    int8_rate(8192, 8192, 8192, k_small=32, k_large=256)


if __name__ == "__main__":
    main()
