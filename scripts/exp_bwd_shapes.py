"""Per-shape chip probe for the fused resblock BACKWARD kernel.

For every flagship block shape, times fused_resblock_train_grads at
candidate batch tiles (forced through GDDIM_BWD_BT, read at call time)
against the XLA-recompute fallback (jax.vjp of resblock_train_reference),
delta-K differenced like every other chip experiment. Mosaic compile
rejections are caught and recorded — the estimator in resblock_bwd.py is
a guess; this probe is the authority that fills _DEFAULT_BWD_BT_MAP.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:$PYTHONPATH \
       python scripts/exp_bwd_shapes.py [shapes...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds

from gddim_tpu.ops import resblock_bwd as rbw
from gddim_tpu.ops.resblock import resblock_train_reference

B = 64
SHAPES = {
    "s32": (32, 128, 128),
    "s16": (16, 256, 256),
    "s8": (8, 256, 256),
    "s4": (4, 256, 256),
    "p32": (32, 256, 128),
    "p32w": (32, 384, 128),
    "p16": (16, 512, 256),
    "p8": (8, 512, 256),
    "p4": (4, 512, 256),
}


def build(s, cin, cout, variant, keep=0.9):
    rng = np.random.default_rng(0)
    f = lambda *sh: jnp.asarray(rng.normal(size=sh), jnp.float32)
    temb = f(B, cout) * 0.1
    gn1s, gn1b = f(cin) * 0.1 + 1.0, f(cin) * 0.1
    w1, b1 = f(3, 3, cin, cout) * 0.05, f(cout) * 0.1
    gn2s, gn2b = f(cout) * 0.1 + 1.0, f(cout) * 0.1
    w2, b2 = f(3, 3, cout, cout) * 0.05, f(cout) * 0.1
    has_skip = cin != cout
    wsk = f(cin, cout) * 0.1 if has_skip else jnp.zeros((1, 1))
    bsk = f(cout) * 0.1 if has_skip else jnp.zeros((1,))
    mask = jnp.asarray(
        (rng.uniform(size=(B, s, s, cout)) < keep).astype(np.int8)
    )
    ng1, ng2 = min(cin // 4, 32), min(cout // 4, 32)
    params = (temb, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2, wsk, bsk)
    bf = lambda a: a.astype(jnp.bfloat16)

    def step(x):
        g = jnp.tanh(x[..., :cout])  # chainable cotangent (cout <= cin here)
        if variant == "pallas":
            grads = rbw.fused_resblock_train_grads(
                x, *params, mask, g, num_groups1=ng1, num_groups2=ng2,
                keep_prob=keep, has_skip=has_skip, mm_dtype=jnp.bfloat16,
            )
            return grads[0]
        _, vjp = jax.vjp(
            lambda xx: resblock_train_reference(
                bf(xx), *[bf(p) if p.ndim >= 1 else p for p in params[:9]],
                bf(wsk), bf(bsk), mask, keep_prob=keep, has_skip=has_skip,
                num_groups1=ng1, num_groups2=ng2,
            ),
            x,
        )
        return vjp(bf(g))[0]

    x0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, s, s, cin)), jnp.bfloat16
    )
    return step, x0


def main():
    names = sys.argv[1:] or list(SHAPES)
    print(f"B={B}, delta-K per-application times (ms), bf16 mm")
    for nm in names:
        s, cin, cout = SHAPES[nm]
        row = [f"{nm:5s} {s}x{s} {cin}->{cout}:"]
        t_xla = per_app_seconds(
            build(s, cin, cout, "xla")[0], build(s, cin, cout, "xla")[1],
            k_small=8, k_large=40,
        )
        row.append(f"xla {t_xla*1e3:7.3f}")
        for bt in (1, 2, 4, 8, 16):
            if B % bt:
                continue
            os.environ["GDDIM_BWD_BT"] = str(bt)
            try:
                step, x0 = build(s, cin, cout, "pallas")
                t = per_app_seconds(step, x0, k_small=8, k_large=40)
                row.append(f"bt{bt} {t*1e3:7.3f}")
            except Exception as e:
                msg = str(e).split("\n")[0][:40]
                row.append(f"bt{bt} FAIL({type(e).__name__}:{msg})")
            finally:
                os.environ.pop("GDDIM_BWD_BT", None)
                jax.clear_caches()
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
