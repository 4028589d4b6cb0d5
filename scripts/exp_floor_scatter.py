"""Scatter-form conv-only floors per level (round-5 composition bound).

The round-4 scatter rework invalidated the round-3c speed-of-light bound
(it was built from GATHER-form conv floors). This probe measures the new
floors: the same _conv9_scatter dataflow the production v2 kernels use,
with every VPU stage deleted except the one int8 requantize between the
two convs (inherent to the int8 pipeline). Inputs arrive already int8
through the BlockSpec, so no quantize pass is timed.

Sweeps, per flagship level shape:
  - tap group size g in {1, 3, 9} (GDDIM_CONV9_GROUP candidates)
  - batch tile bt around the production pick

Timing: delta-K differencing (scripts/_timing.py) — immune to the axon
tunnel's variable per-dispatch overhead.

Usage: PYTHONPATH=.:scripts python scripts/exp_floor_scatter.py [b]
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.ops import resblock as rb


def _floor_kernel(x_ref, w1_ref, w2_ref, o_ref, *, bt, h, w, cin, cout, group):
    n = h * w
    x2d = x_ref[...].reshape(bt * n, cin)
    acc = rb._conv9_scatter(
        [x2d], w1_ref, bt, h, w, cout, jnp.int8, group=group
    )
    mid = jnp.clip(acc, -127, 127).astype(jnp.int8)
    acc2 = rb._conv9_scatter(
        [mid], w2_ref, bt, h, w, cout, jnp.int8, group=group
    )
    o_ref[...] = jnp.clip(acc2, -127, 127).astype(jnp.int8).reshape(bt, n, cout)


def conv_floor(x, w1p, w2p, group, bt):
    b, h, w_, cin = x.shape
    cout = w2p.shape[0]
    kernel = functools.partial(
        _floor_kernel, bt=bt, h=h, w=w_, cin=cin, cout=cout, group=group
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h * w_, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((cin, 9 * cout)), const((cout, 9 * cout)),
        ],
        out_specs=pl.BlockSpec((bt, h * w_, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w_, cout), jnp.int8),
    )(x.reshape(b, h * w_, cin), w1p, w2p)
    return out.reshape(b, h, w_, cout)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend={jax.default_backend()} B={b} (scatter conv-only floors)")
    rng = np.random.default_rng(0)

    # (s, cin, cout): flagship single-block level shapes + pair conv1 widths
    shapes = [(32, 128, 128), (16, 256, 256), (8, 256, 256), (4, 256, 256),
              (32, 256, 128), (32, 384, 128), (16, 512, 256), (8, 512, 256),
              (4, 512, 256)]
    for s, cin, cout in shapes:
        x0 = jnp.asarray(
            np.clip(rng.normal(size=(b, s, s, cin)) * 40, -127, 127),
            jnp.int8,
        )
        w1 = np.clip(rng.normal(size=(9, cin, cout)) * 3, -4, 4).astype(np.int8)
        w2 = np.clip(rng.normal(size=(9, cout, cout)) * 3, -4, 4).astype(np.int8)
        w1p = jnp.asarray(rb._pack_w_scatter(w1))
        w2p = jnp.asarray(rb._pack_w_scatter(w2))
        gf = 2 * b * s * s * 9 * (cin * cout + cout * cout) / 1e9

        bt_prod = rb._pick_bt(b, s, s, cin, cout, max_bt=64, work_tiles=3,
                              scatter=True)
        bts = sorted({bt_prod, max(1, bt_prod // 2), min(b, bt_prod * 2)})
        for bt in bts:
            if b % bt:
                continue
            for g in (1, 3, 9):
                def step(xx, _g=g, _bt=bt, _w1=w1p, _w2=w2p, _cin=cin,
                         _cout=cout):
                    y = conv_floor(xx, _w1, _w2, _g, _bt)
                    if _cout == _cin:
                        return y
                    reps = -(-_cin // _cout)
                    return jnp.concatenate([y] * reps, axis=-1)[..., :_cin]

                try:
                    dt = per_app_seconds(step, x0)
                except Exception as e:
                    print(f"  {s:2d}x{s:2d} {cin:3d}->{cout:3d} bt={bt:2d} "
                          f"g={g}: FAIL {type(e).__name__}: {e}")
                    continue
                tag = " <- prod bt" if bt == bt_prod else ""
                print(
                    f"  {s:2d}x{s:2d} {cin:3d}->{cout:3d} bt={bt:2d} g={g}: "
                    f"{dt*1e3:7.3f} ms {gf/dt/1e3:7.1f} TOP/s-eq{tag}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
