"""VPU floors per level: the composition bound's other half (round 5).

The scatter conv floors (exp_floor_scatter.py) priced the MXU side of each
fused block; this probe prices the VPU side. Three measurements per
flagship level shape, same production kernels, delta-K timing:

  full  : the production fused block (v2 + scatter, int8 static)
  vpu   : the SAME kernel with `_conv9_scatter` monkeypatched to a
          matmul-free stub (one cast + slice) — everything the block does
          besides the conv matmuls: GN stats, normalize+SiLU, quantize,
          epilogues, skip matmul, HBM in/out DMA
  conv  : the conv-only floor kernel (exp_floor_scatter._floor_kernel) at
          the production (bt, g)

plus one pure-VPU rate probe (a chain of fused multiply-add+sigmoid passes
over a VMEM-resident f32 tile) giving the chip's elementwise ceiling, so
`vpu` can be judged against the hardware rather than against hope.

Reading the table: full ~= conv + vpu means the two pipelines serialize
(Mosaic cannot overlap them through the data dependence); the composition
bound for the graph is then sum(conv_i + vpu_i) + attention + glue, NOT
sum(conv_i). If vpu runs at a large fraction of the pure-VPU rate, the
non-conv share is at ITS floor and the residual is not harvestable.

Usage: PYTHONPATH=.:scripts python scripts/exp_vpu_floor.py [b]
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

B = 64


# ---------------------------------------------------------------- pure VPU
def vpu_rate(passes: int = 64, rows: int = 512, cols: int = 512) -> float:
    """f32 elementwise ops/s on a VMEM-resident tile: `passes` chained
    x*a+b + sigmoid(x)*x rounds (7 ops/elem/pass counting sigmoid as 4)."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for i in range(passes):
            x = x * jnp.float32(1.0001) + jnp.float32(0.01 * (i % 3))
            x = x * jax.nn.sigmoid(x)
        o_ref[...] = x

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(rows, cols)) * 0.1,
                     jnp.float32)
    dt = per_app_seconds(f, x0)
    ops = 7.0 * passes * rows * cols
    return ops / dt


# ------------------------------------------------------------ conv stub
def _conv_stub(xs, w_ref, bt, h, w, cout, dtype, group=None):
    """Shape-compatible, matmul-free stand-in for _conv9_scatter: one cast
    + slice keeps the dataflow (output depends on input, nothing is DCE'd)
    without any MXU work. All flagship shapes have part widths >= cout."""
    del w_ref, dtype, group
    n = bt * h * w
    acc = jnp.zeros((n, cout), jnp.int32)
    for x2d in xs:
        acc = acc + x2d[:, :cout].astype(jnp.int32)
    return acc


class patched_conv:
    def __enter__(self):
        self._orig = rb._conv9_scatter
        rb._conv9_scatter = _conv_stub
        return self

    def __exit__(self, *a):
        rb._conv9_scatter = self._orig


# ------------------------------------------------------- production blocks
def single_step(s, cin, cout):
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, jnp.float32)
    wsk = (
        jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
        if cin != cout else None
    )
    temb = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)
    ones = lambda c: jnp.ones((c,), jnp.float32)
    zeros = lambda c: jnp.zeros((c,), jnp.float32)

    def step(x):
        y = rb.fused_resblock(
            x, temb, ones(cin), zeros(cin), w1, zeros(cout), ones(cout),
            zeros(cout), w2, zeros(cout),
            w_skip=wsk, b_skip=(zeros(cout) if wsk is not None else None),
            num_groups1=32, num_groups2=32, mm_dtype=jnp.int8,
            act_scales=(0.05, 0.05, None),
        )
        return y if cout == cin else y[..., :cin]

    return step


def pair_step(s, c1, c2, cout):
    rng = np.random.default_rng(0)
    cin = c1 + c2
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, jnp.float32)
    wsk = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, cout)) * 0.1, jnp.float32)
    ones = lambda c: jnp.ones((c,), jnp.float32)
    zeros = lambda c: jnp.zeros((c,), jnp.float32)

    def step(xa):
        y = rb.fused_resblock_pair(
            xa, xa[..., :c2], temb, ones(cin), zeros(cin), w1, zeros(cout),
            ones(cout), zeros(cout), w2, zeros(cout), wsk, zeros(cout),
            num_groups1=32, num_groups2=32, mm_dtype=jnp.int8,
            act_scales=(0.05, 0.05, None),
        )
        if cout == c1:
            return y
        reps = -(-c1 // cout)
        return jnp.concatenate([y] * reps, axis=-1)[..., :c1]

    return step


# --------------------------------------------------------- conv-only floor
def conv_floor_time(s, cin, cout, rng):
    import exp_floor_scatter as efs

    x0 = jnp.asarray(
        np.clip(rng.normal(size=(B, s, s, cin)) * 40, -127, 127), jnp.int8
    )
    w1 = np.clip(rng.normal(size=(9, cin, cout)) * 3, -4, 4).astype(np.int8)
    w2 = np.clip(rng.normal(size=(9, cout, cout)) * 3, -4, 4).astype(np.int8)
    w1p = jnp.asarray(rb._pack_w_scatter(w1))
    w2p = jnp.asarray(rb._pack_w_scatter(w2))
    bt = rb._pick_bt(B, s, s, cin, cout, max_bt=64, work_tiles=3, scatter=True)
    g = rb._conv9_group_for(s * s, cin)

    def step(xx):
        y = efs.conv_floor(xx, w1p, w2p, g, bt)
        if cout == cin:
            return y
        reps = -(-cin // cout)
        return jnp.concatenate([y] * reps, axis=-1)[..., :cin]

    return per_app_seconds(step, x0)


CASES = [
    # (label, make_step, x_cin, s, conv_cin, conv_cout)
    ("single 32x32 128", lambda: single_step(32, 128, 128), 128, 32, 128, 128),
    ("single 16x16 256", lambda: single_step(16, 256, 256), 256, 16, 256, 256),
    ("single 8x8 256", lambda: single_step(8, 256, 256), 256, 8, 256, 256),
    ("single 4x4 256", lambda: single_step(4, 256, 256), 256, 4, 256, 256),
    ("pair 32x32 256->128", lambda: pair_step(32, 128, 128, 128), 128, 32,
     256, 128),
    ("pair 32x32 384->128", lambda: pair_step(32, 256, 128, 128), 256, 32,
     384, 128),
    ("pair 16x16 512->256", lambda: pair_step(16, 256, 256, 256), 256, 16,
     512, 256),
    ("pair 8x8 512->256", lambda: pair_step(8, 256, 256, 256), 256, 8,
     512, 256),
    ("pair 4x4 512->256", lambda: pair_step(4, 256, 256, 256), 256, 4,
     512, 256),
]


def main():
    global B
    if len(sys.argv) > 1:
        B = int(sys.argv[1])
    only = sys.argv[2] if len(sys.argv) > 2 else None
    print(f"backend={jax.default_backend()} B={B} (VPU floors)", flush=True)
    rate = vpu_rate()
    print(f"  pure VPU f32 rate: {rate / 1e12:.2f} Tops/s", flush=True)
    rng = np.random.default_rng(1)
    print(f"  {'shape':22s} {'full':>8s} {'vpu':>8s} {'conv':>8s} "
          f"{'conv+vpu':>9s} {'resid':>7s}")
    for label, mk, cin, s, conv_cin, conv_cout in CASES:
        if only and only not in label:
            continue
        x0 = jnp.asarray(rng.normal(size=(B, s, s, cin)) * 0.5, jnp.bfloat16)
        try:
            full = per_app_seconds(mk(), x0)
            with patched_conv():
                vpu = per_app_seconds(mk(), x0)
            jax.clear_caches()
            conv = conv_floor_time(s, conv_cin, conv_cout, rng)
        except Exception as e:
            print(f"  {label:22s}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            continue
        resid = full - (conv + vpu)
        print(
            f"  {label:22s} {full*1e3:8.3f} {vpu*1e3:8.3f} {conv*1e3:8.3f} "
            f"{(conv+vpu)*1e3:9.3f} {resid*1e3:+7.3f}  ms", flush=True,
        )


if __name__ == "__main__":
    main()
