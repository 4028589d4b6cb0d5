"""Microbench: conv3x3 at model shapes — XLA vs Pallas bf16 vs Pallas int8.

The axon tunnel costs ~1.1 ms per DISPATCH (even queued asynchronously), so
single-op timings lie. Each measurement scans K=32 chained applications
inside ONE jit program and divides by K.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_xla
from gddim_tpu.ops.conv3x3 import conv3x3_pallas_int8, quantize_per_sample

K = 32


def bench_scan(step_fn, x0, reps=6):
    @jax.jit
    def run(x):
        def body(h, _):
            return step_fn(h), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).mean()  # scalar: tunnel transfers 4 bytes

    out = run(x0)
    _ = float(np.asarray(out))
    t0 = time.time()
    outs = [run(x0) for _ in range(reps)]
    _ = float(np.asarray(outs[-1]))
    return (time.time() - t0) / (reps * K)


def main():
    rng = np.random.default_rng(0)
    for (b, s, c) in [(64, 32, 128), (64, 16, 256), (256, 16, 256), (64, 8, 256)]:
        x = (rng.normal(size=(b, s, s, c)) * 0.5).astype(np.float32)
        wgt = (rng.normal(size=(3, 3, c, c)) * (1.5 / np.sqrt(9 * c))).astype(np.float32)
        xbf = jnp.asarray(x, jnp.bfloat16)
        wbf = jnp.asarray(wgt, jnp.bfloat16)
        t_xla = bench_scan(lambda h: conv3x3_xla(h, wbf), xbf)
        t_pal = bench_scan(lambda h: conv3x3_pallas(h, wbf), xbf)
        sw = np.abs(wgt).max(axis=(0, 1, 2)) / 127.0
        w8 = jnp.asarray(np.clip(np.round(wgt / sw), -127, 127), jnp.int8)
        swj = jnp.asarray(sw, jnp.float32)

        def int8_step(h):
            h8, sx = quantize_per_sample(h)
            return conv3x3_pallas_int8(h8, w8, swj, sx, out_dtype=jnp.bfloat16)

        t_i8 = bench_scan(int8_step, xbf)
        flops = 2 * b * s * s * 9 * c * c
        print(
            f"B{b} {s}x{s} {c}->{c}: xla {t_xla*1e3:6.2f}ms ({flops/t_xla/1e12:5.1f}TF) "
            f"pallas {t_pal*1e3:6.2f}ms ({flops/t_pal/1e12:5.1f}TF) "
            f"int8(incl quant) {t_i8*1e3:6.2f}ms ({flops/t_i8/1e12:5.1f}TOP)",
            flush=True,
        )
        ref = np.asarray(conv3x3_xla(jnp.asarray(x), jnp.asarray(wgt)))
        x8, sx = quantize_per_sample(jnp.asarray(x))
        got = np.asarray(conv3x3_pallas_int8(x8, w8, swj, sx, out_dtype=jnp.float32))
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"  int8 rel err vs f32 conv: {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
