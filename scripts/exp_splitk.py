"""A/B: split-K=128 contraction chunks vs full-K dots in the fused block
kernels, at the wide-K shapes (pairs 256/384/512-in, singles 256-in).

Motivation: delta-K matmul probes suggest the int8 MXU sustains ~220 TOP/s
at K=N=256 but much less at K>=256 -> N=128 — if Mosaic schedules a wide-K
dot to a narrow-N output poorly, accumulating 128-wide chunks may be faster
for the pair kernels whose conv1 is K=256/384 -> N=128.

Usage: GDDIM_CONV9_SPLITK=128 python scripts/exp_splitk.py  (vs unset)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds

from gddim_tpu.ops.resblock import fused_resblock, fused_resblock_pair


def main():
    b = 64
    static = True
    scales = (0.05, 0.05, None)
    print(
        f"backend={jax.default_backend()} B={b} "
        f"SPLITK={os.environ.get('GDDIM_CONV9_SPLITK', '0')}"
    )
    rng = np.random.default_rng(0)

    # pair blocks: conv1 K=c1+c2 -> N=cout
    for s, c1, c2, cout in [(32, 128, 128, 128), (32, 256, 128, 128),
                            (16, 256, 256, 256)]:
        cin = c1 + c2
        w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, jnp.float32)
        wsk = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
        temb = jnp.asarray(rng.normal(size=(b, cout)) * 0.1, jnp.float32)
        ones = lambda c: jnp.ones((c,), jnp.float32)
        zeros = lambda c: jnp.zeros((c,), jnp.float32)

        def pair_step(xa):
            y = fused_resblock_pair(
                xa, xa[..., :c2], temb, ones(cin), zeros(cin), w1, zeros(cout),
                ones(cout), zeros(cout), w2, zeros(cout), wsk, zeros(cout),
                num_groups1=32, num_groups2=32, mm_dtype=jnp.int8,
                act_scales=scales if static else None,
            )
            if cout == c1:
                return y
            reps = -(-c1 // cout)
            return jnp.tile(y, (1, 1, 1, reps))[..., :c1]

        x0 = jnp.asarray(rng.normal(size=(b, s, s, c1)) * 0.5, jnp.bfloat16)
        dt = per_app_seconds(pair_step, x0)
        gf = 2 * b * s * s * 9 * (cin * cout + cout * cout) / 1e9
        print(
            f"pair {s:2d}x{s:2d} ({c1}/{c2})->{cout}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:6.1f} TF/s-eq",
            flush=True,
        )

    # single block at 16x16 c=256 (conv K=256 -> N=256: expected neutral)
    for s, c in [(16, 256)]:
        w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        temb = jnp.asarray(rng.normal(size=(b, c)) * 0.1, jnp.float32)
        ones = jnp.ones((c,), jnp.float32)
        zeros = jnp.zeros((c,), jnp.float32)

        def step(x):
            return fused_resblock(
                x, temb, ones, zeros, w1, zeros, ones, zeros, w2, zeros,
                num_groups1=32, num_groups2=32, mm_dtype=jnp.int8,
                act_scales=scales if static else None,
            )

        x0 = jnp.asarray(rng.normal(size=(b, s, s, c)) * 0.5, jnp.bfloat16)
        dt = per_app_seconds(step, x0)
        gf = 2 * b * s * s * 9 * (2 * c * c) / 1e9
        print(
            f"single {s:2d}x{s:2d} {c}->{c}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:6.1f} TF/s-eq",
            flush=True,
        )


if __name__ == "__main__":
    main()
