"""Isolate fixed per-iteration overhead in the scan-of-pallas_call harness."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 32


def bench_scan(step_fn, reps=6):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), None

        c, _ = jax.lax.scan(body, c0, None, length=K)
        return c

    out = run(jnp.int32(0))
    _ = int(out)
    t0 = time.time()
    outs = [run(jnp.int32(r)) for r in range(reps)]
    _ = int(outs[-1])
    return (time.time() - t0) / (reps * K)


def _empty_kernel(c_ref, o_ref):
    o_ref[0, 0] = c_ref[0]


def _mm_kernel(c_ref, x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + c_ref[0]


def main():
    rng = np.random.default_rng(0)

    # 1. empty pallas call
    f_empty = pl.pallas_call(
        _empty_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    t = bench_scan(lambda c: f_empty(c.reshape(1))[0, 0])
    print(f"empty pallas call: {t*1e6:8.1f} us", flush=True)

    # 2. XLA int8 matmul same harness
    x = jnp.asarray(rng.integers(-4, 4, (4096, 1152)), jnp.int8)
    w = jnp.asarray(rng.integers(-4, 4, (1152, 128)), jnp.int8)

    def xla_mm(c):
        out = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ) + c
        return out[0, 0]

    t = bench_scan(xla_mm)
    fl = 2 * 4096 * 1152 * 128
    print(f"XLA int8 (4096,1152)@(1152,128): {t*1e6:8.1f} us ({fl/t/1e12:6.1f} TOP)", flush=True)

    # 3. pallas matmul, same shape
    f_mm = pl.pallas_call(
        _mm_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.int32),
    )
    t = bench_scan(lambda c: f_mm(c.reshape(1), x, w)[0, 0])
    print(f"pallas int8 same shape: {t*1e6:8.1f} us ({fl/t/1e12:6.1f} TOP)", flush=True)

    # 4. bigger matmul to see asymptote (XLA)
    xb = jnp.asarray(rng.integers(-4, 4, (8192, 8192)), jnp.int8)
    wb = jnp.asarray(rng.integers(-4, 4, (8192, 8192)), jnp.int8)

    def xla_big(c):
        out = jax.lax.dot_general(
            xb, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ) + c
        return out[0, 0]

    t = bench_scan(xla_big)
    flb = 2 * 8192**3
    print(f"XLA int8 8192^3: {t*1e6:8.1f} us ({flb/t/1e12:6.1f} TOP)", flush=True)


if __name__ == "__main__":
    main()
