"""Per-shape A/B: whole-transition kernel vs the round-3 tail composition.

The round-4 whole-transition kernel (ops/resblock.py:fused_resblock_transition)
regressed the headline 83.5 -> 79.2 img/s; this measures WHERE. For each
flagship transition shape, delta-K timing of:

  full: fused_resblock_transition (GN1+SiLU + in-kernel FIR both paths + tail)
  tail: group_norm_silu + XLA FIR resample x2 + fused_resblock_tail
        (the round-3 production path)

both at production settings (int8 MXU, calibrated static scales, bf16 state).
Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_transition.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds

from gddim_tpu.models import resample
from gddim_tpu.ops import resblock as rb
from gddim_tpu.ops.groupnorm import group_norm_silu


def make_variants(b, h_in, w_in, c, cout, up):
    rng = np.random.default_rng(0)

    def arr(*s, sc=1.0):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)

    temb = arr(b, cout)
    params = dict(
        gn1_scale=1 + arr(c, sc=0.1), gn1_bias=arr(c, sc=0.1),
        w1=arr(3, 3, c, cout, sc=0.05), b1=arr(cout, sc=0.1),
        gn2_scale=1 + arr(cout, sc=0.1), gn2_bias=arr(cout, sc=0.1),
        w2=arr(3, 3, cout, cout, sc=0.05), b2=arr(cout, sc=0.1),
    )
    w_skip, b_skip = arr(c, cout, sc=0.1), arr(cout, sc=0.1)
    scales = rb.act_scales_from_amax((4.0, 4.0, None))
    kern = (1, 3, 3, 1)
    ng1, ng2 = min(c // 4, 32), min(cout // 4, 32)

    def full(x):
        y = rb.fused_resblock_transition(
            x, temb, params["gn1_scale"], params["gn1_bias"],
            params["w1"], params["b1"], params["gn2_scale"], params["gn2_bias"],
            params["w2"], params["b2"], w_skip, b_skip,
            up=up, fir=True, fir_kernel=kern, num_groups1=ng1, num_groups2=ng2,
            mm_dtype=jnp.int8, act_scales=scales,
        )
        return y[..., :c] if cout != c else y  # keep chain type-stable

    def tail(x):
        hh = group_norm_silu(x, params["gn1_scale"], params["gn1_bias"], ng1)
        res = resample.upsample_2d if up else resample.downsample_2d
        hh = res(hh, kern, factor=2)
        xr = res(x, kern, factor=2)
        y = rb.fused_resblock_tail(
            hh, xr, temb, params["w1"], params["b1"],
            params["gn2_scale"], params["gn2_bias"], params["w2"], params["b2"],
            w_skip, b_skip, num_groups2=ng2, mm_dtype=jnp.int8,
            act_scales=scales,
        )
        return y[..., :c] if cout != c else y

    # output res differs from input res: close the chain by resampling back
    h_out, w_out = (2 * h_in, 2 * w_in) if up else (h_in // 2, w_in // 2)

    def chainable(f):
        back = resample.downsample_2d if up else resample.upsample_2d

        def g(x):
            return back(f(x), kern, factor=2).astype(x.dtype)

        return g

    x0 = jnp.asarray(
        rng.normal(size=(b, h_in, w_in, c)).astype(np.float32), jnp.bfloat16
    )
    return chainable(full), chainable(tail), x0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cases = [
        ("down 32->16", 32, 32, 128, 256, False),
        ("down 16->8", 16, 16, 256, 256, False),
        ("down 8->4", 8, 8, 256, 256, False),
        ("up 4->8", 4, 4, 256, 256, True),
        ("up 8->16", 8, 8, 256, 256, True),
        ("up 16->32", 16, 16, 256, 256, True),
    ]
    print(f"batch={b}", flush=True)
    for name, h, w, c, cout, up in cases:
        full, tail, x0 = make_variants(b, h, w, c, cout, up)
        row = f"{name:12s}"
        for label, f in (("full", full), ("tail", tail)):
            try:
                dt = per_app_seconds(f, x0, k_small=8, k_large=64, reps=3)
                row += f"  {label}={dt*1e3:7.3f} ms"
            except Exception as e:
                row += f"  {label}=FAIL({type(e).__name__}:{str(e)[:60]})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
