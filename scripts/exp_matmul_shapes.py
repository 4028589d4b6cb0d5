"""Experiment: MXU int8 rate for the fused-resblock's conv matmuls.

Question: do 9 separate shifted (M, C)x(C, Cout) matmuls (current _conv9)
leave MXU throughput on the table vs one K-deep im2col matmul
(M, 9C)x(9C, Cout)?  Measures pure-matmul pallas kernels at the flagship's
dominant shapes, plus the im2col-with-copy variant (the copy is the
realistic price).

Methodology per PERF.md: K chained calls inside one jit, scalar fetch. The
matmul operands are loop-invariant; a scalar carry is threaded through each
kernel (added in the epilogue, next carry = out[0,0]) so XLA cannot hoist
the call out of the scan.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 32


def bench_scan(step_fn, reps=6):
    """step_fn(carry_scalar_i32) -> scalar i32."""

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


def _nine_kernel(c_ref, x_ref, w_ref, o_ref):
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    for i in range(9):
        acc += jax.lax.dot_general(
            x_ref[i], w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[...] = acc + c_ref[0]


def _deep_kernel(c_ref, x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + c_ref[0]


def _deep_copy_kernel(c_ref, x_ref, w_ref, o_ref, scr):
    c = x_ref.shape[2]
    for i in range(9):
        scr[:, i * c : (i + 1) * c] = x_ref[i]
    o_ref[...] = jax.lax.dot_general(
        scr[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + c_ref[0]


def _call(kernel, m, cout, scratch=None):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.int32),
        scratch_shapes=scratch or [],
    )


def run_shape(m, c, cout):
    rng = np.random.default_rng(0)
    x9 = jnp.asarray(rng.integers(-4, 4, (9, m, c)), jnp.int8)
    w9 = jnp.asarray(rng.integers(-4, 4, (9, c, cout)), jnp.int8)
    xd = jnp.asarray(x9.transpose(1, 0, 2).reshape(m, 9 * c))
    wd = jnp.asarray(w9.reshape(9 * c, cout))
    flops = 2 * m * 9 * c * cout

    def mk(kernel, args, scratch=None):
        f = _call(kernel, m, cout, scratch)

        def step(carry):
            out = f(carry.reshape(1), *args)
            return out[0, 0]

        return step

    t9 = bench_scan(mk(_nine_kernel, (x9, w9)))
    td = bench_scan(mk(_deep_kernel, (xd, wd)))
    tdc = bench_scan(
        mk(_deep_copy_kernel, (x9, wd), [pltpu.VMEM((m, 9 * c), jnp.int8)])
    )
    print(
        f"M={m:5d} C={c}->{cout}: 9x(K={c}) {t9*1e3:6.3f}ms ({flops/t9/1e12:6.1f}TOP)  "
        f"1x(K={9*c}) {td*1e3:6.3f}ms ({flops/td/1e12:6.1f}TOP)  "
        f"im2col+copy {tdc*1e3:6.3f}ms ({flops/tdc/1e12:6.1f}TOP)",
        flush=True,
    )


def main():
    run_shape(4 * 1024, 128, 128)   # 32x32 bt=4
    run_shape(8 * 256, 256, 256)    # 16x16 bt=8
    run_shape(16 * 64, 256, 256)    # 8x8 bt=16
    run_shape(2 * 1024, 384, 128)   # 32x32 up-path concat


if __name__ == "__main__":
    main()
