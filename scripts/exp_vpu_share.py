"""How much of the fused-resblock time is VPU (GN/SiLU/quant/epilogue)?

Hypothesis: inside one Pallas kernel body the per-sample VPU chain
(GroupNorm stats, SiLU, quantize, dequant epilogues) serializes against the
batched MXU matmuls — at the 32x32/128ch shape the VPU work is comparable
to the MXU work, which would explain the fused block running well below the
standalone conv ceiling.

Measures, per level shape:
  conv-only : 9-shift conv x2 from VMEM-resident padded scratch (no GN, no
              quant, no epilogue) — the kernel's MXU floor
  full      : the production fused_resblock (int8, static scales)
The difference is the serialized non-matmul cost.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.ops.resblock import _conv9, _pick_bt, fused_resblock

K = 16
REPS = 4


def bench_scan(step_fn, x0, length=K, reps=REPS):
    # delta-K differencing (see scripts/_timing.py): removes the variable
    # per-dispatch tunnel overhead that polluted the round-3b readings
    from _timing import per_app_seconds

    del length, reps
    return per_app_seconds(step_fn, x0)


def _conv_only_kernel(x_ref, w1_ref, w2_ref, o_ref, hpad_ref, hpad2_ref, *,
                      bt, h, w, cin, cout, mm_dtype):
    int8 = mm_dtype == jnp.int8

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        hpad_ref[...] = jnp.zeros_like(hpad_ref)
        hpad2_ref[...] = jnp.zeros_like(hpad2_ref)

    for s in range(bt):
        a = x_ref[s]
        if int8:
            a = jnp.clip(a.astype(jnp.float32), -127, 127).astype(jnp.int8)
        hpad_ref[s, 1 : h + 1, 1 : w + 1, :] = a.reshape(h, w, cin).astype(
            hpad_ref.dtype
        )
    acc = _conv9(hpad_ref, w1_ref, bt, h, w, cin, cout, mm_dtype)
    for s in range(bt):
        n = h * w
        a = acc[s * n : (s + 1) * n]
        if int8:
            a = jnp.clip(a, -127, 127).astype(jnp.int8)
        else:
            a = a.astype(hpad2_ref.dtype)
        hpad2_ref[s, 1 : h + 1, 1 : w + 1, :] = a.reshape(h, w, cout)
    acc2 = _conv9(hpad2_ref, w2_ref, bt, h, w, cout, cout, mm_dtype)
    for s in range(bt):
        n = h * w
        o_ref[s] = acc2[s * n : (s + 1) * n].astype(o_ref.dtype)


def conv_only(x, w1, w2, mm_dtype):
    b, h, w_, cin = x.shape
    cout = w1.shape[-1]
    bt = _pick_bt(b, h, w_, cin, cout)
    kernel = functools.partial(
        _conv_only_kernel, bt=bt, h=h, w=w_, cin=cin, cout=cout,
        mm_dtype=mm_dtype,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h * w_, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((9, cin, cout)), const((9, cout, cout)),
        ],
        out_specs=pl.BlockSpec((bt, h * w_, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w_, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, w_ + 2, cin), mm_dtype),
            pltpu.VMEM((bt, h + 2, w_ + 2, cout), mm_dtype),
        ],
    )(x.reshape(b, h * w_, cin), w1, w2)
    return out.reshape(b, h, w_, cout)


def main():
    b = 64
    print(f"backend={jax.default_backend()} B={b}")
    rng = np.random.default_rng(0)
    for s, c in [(32, 128), (16, 256), (8, 256), (4, 256)]:
        x0 = jnp.asarray(rng.normal(size=(b, s, s, c)) * 0.5, jnp.bfloat16)
        gf = 2 * b * s * s * 9 * (c * c + c * c) / 1e9

        for mm, name in [(jnp.int8, "int8"), (jnp.bfloat16, "bf16")]:
            wdt = jnp.int8 if mm == jnp.int8 else jnp.bfloat16
            w1 = jnp.asarray(
                np.clip(rng.normal(size=(9, c, c)) * 3, -4, 4), wdt
            )
            w2 = jnp.asarray(
                np.clip(rng.normal(size=(9, c, c)) * 3, -4, 4), wdt
            )

            def step(xx):
                y = conv_only(xx, w1, w2, mm)
                return (y * 1e-3).astype(xx.dtype)  # keep magnitudes bounded

            dt = bench_scan(step, x0)
            print(
                f"conv-only {name} {s:2d}x{s:2d} c={c}: {dt*1e3:7.3f} ms "
                f"{gf/dt/1e3:7.1f} TF/s-eq"
            )

        # production full block for comparison (int8 static)
        w1f = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        w2f = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        temb = jnp.asarray(rng.normal(size=(b, c)) * 0.1, jnp.float32)
        ones = jnp.ones((c,), jnp.float32)
        zeros = jnp.zeros((c,), jnp.float32)

        def full_step(xx):
            return fused_resblock(
                xx, temb, ones, zeros, w1f, zeros, ones, zeros, w2f, zeros,
                num_groups1=32, num_groups2=32, mm_dtype=jnp.int8,
                act_scales=(0.05, 0.05, None),
            )

        dt = bench_scan(full_step, x0)
        print(
            f"full block int8 {s:2d}x{s:2d} c={c}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:7.1f} TF/s-eq"
        )


if __name__ == "__main__":
    main()
