"""Pure MXU int8 rate vs contraction depth: grid of R kernel executions over
the same VMEM-resident operands (per-step overhead is tiny, no cross-step
CSE), so fixed call overhead amortizes away. Answers: is 9x(K=C) slower
than 1x(K=9C)?"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128  # kernel executions per call


def _mm_kernel(x_ref, w_ref, o_ref, *, m, k, cout, nine):
    x = x_ref[...]
    if nine:
        acc = jnp.zeros((m, cout), jnp.int32)
        for i in range(9):
            acc += jax.lax.dot_general(
                x[:, i * k // 9 : (i + 1) * k // 9],
                w_ref[...][i * k // 9 : (i + 1) * k // 9],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    else:
        acc = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[...] = acc + pl.program_id(0)


def bench(m, k, cout, nine):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-4, 4, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-4, 4, (k, cout)), jnp.int8)
    same = lambda i: (0, 0)
    f = pl.pallas_call(
        functools.partial(_mm_kernel, m=m, k=k, cout=cout, nine=nine),
        grid=(R,),
        in_specs=[
            pl.BlockSpec((m, k), same, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cout), same, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, cout), same, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.int32),
    )
    g = jax.jit(lambda x: f(x, w).sum())
    out = g(x)
    _ = int(out)
    reps = 4
    t0 = time.time()
    outs = [g(x) for _ in range(reps)]
    _ = int(outs[-1])
    dt = (time.time() - t0) / (reps * R)
    fl = 2 * m * k * cout
    print(
        f"M={m:5d} K={k:4d} N={cout}: {'9-split' if nine else 'deep  '} "
        f"{dt*1e6:7.1f} us/mm  {fl/dt/1e12:6.1f} TOP/s",
        flush=True,
    )


def main():
    for m, k, cout in [(4096, 1152, 128), (2048, 2304, 256), (1024, 2304, 256)]:
        bench(m, k, cout, nine=True)
        bench(m, k, cout, nine=False)


if __name__ == "__main__":
    main()
