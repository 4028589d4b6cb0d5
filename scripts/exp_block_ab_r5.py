"""Round-5 per-level lever A/B: full fused blocks (production settings)
under candidate (impl, group, bt) overrides, standalone delta-K timing.

The floor sweep (exp_floor_scatter.py) shortlists per-level candidates;
this confirms them at the FULL-block level (VPU+conv composition) before
spending full-model bench compiles. Overrides are injected by mutating the
resblock module's shape maps in-process (they are plain dicts).

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:$PYTHONPATH \
       python scripts/exp_block_ab_r5.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds

from gddim_tpu.ops import resblock as rb
from gddim_tpu.ops.resblock import fused_resblock, fused_resblock_pair

B = 64


def set_overrides(group_map=None, impl_map=None, bt_map=None):
    rb.CONV9_GROUP_MAP.clear()
    rb.CONV9_GROUP_MAP.update(group_map or {})
    rb.RESBLOCK_IMPL_MAP.clear()
    rb.RESBLOCK_IMPL_MAP.update(impl_map or {})
    import os

    if bt_map:
        os.environ["GDDIM_RESBLOCK_BT_MAP"] = ",".join(
            (f"{n}.{cin}" if cin else f"{n}") + f":{v}"
            for (n, cin), v in bt_map.items()
        )
    else:
        os.environ.pop("GDDIM_RESBLOCK_BT_MAP", None)


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
        y = fused_resblock(
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
        y = fused_resblock_pair(
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


CASES = [
    # (label, make_step, x_cin, s, overrides)
    ("single 32x32 base", lambda: single_step(32, 128, 128), 128, 32, {}),
    ("single 32x32 bt4", lambda: single_step(32, 128, 128), 128, 32,
     dict(bt_map={(1024, 128): 4})),
    ("single 32x32 bt8", lambda: single_step(32, 128, 128), 128, 32,
     dict(bt_map={(1024, 128): 8})),
    ("single 16x16 base", lambda: single_step(16, 256, 256), 256, 16, {}),
    ("single 16x16 bt4", lambda: single_step(16, 256, 256), 256, 16,
     dict(bt_map={(256, 256): 4})),
    ("single 8x8 base", lambda: single_step(8, 256, 256), 256, 8, {}),
    ("single 8x8 bt16", lambda: single_step(8, 256, 256), 256, 8,
     dict(bt_map={(64, 256): 16})),
    ("single 8x8 g9", lambda: single_step(8, 256, 256), 256, 8,
     dict(group_map={(64, 256): 9})),
    ("single 4x4 base", lambda: single_step(4, 256, 256), 256, 4, {}),
    ("single 4x4 g9", lambda: single_step(4, 256, 256), 256, 4,
     dict(group_map={(16, 256): 9})),
    ("single 4x4 bt64", lambda: single_step(4, 256, 256), 256, 4,
     dict(bt_map={(16, 256): 64})),
    ("pair 32x32 256 base", lambda: pair_step(32, 128, 128, 128), 128, 32, {}),
    ("pair 32x32 256 g9", lambda: pair_step(32, 128, 128, 128), 128, 32,
     dict(group_map={(1024, 256): 9})),
    ("pair 32x32 256 bt2", lambda: pair_step(32, 128, 128, 128), 128, 32,
     dict(bt_map={(1024, 256): 2})),
    ("pair 32x32 384 base", lambda: pair_step(32, 256, 128, 128), 256, 32, {}),
    ("pair 32x32 384 g9", lambda: pair_step(32, 256, 128, 128), 256, 32,
     dict(group_map={(1024, 384): 9})),
    ("pair 16x16 base", lambda: pair_step(16, 256, 256, 256), 256, 16, {}),
    ("pair 16x16 bt2", lambda: pair_step(16, 256, 256, 256), 256, 16,
     dict(bt_map={(256, 512): 2})),
    ("pair 8x8 base", lambda: pair_step(8, 256, 256, 256), 256, 8, {}),
    ("pair 8x8 v1", lambda: pair_step(8, 256, 256, 256), 256, 8,
     dict(impl_map={(64, 512): 1})),
    ("pair 8x8 g1", lambda: pair_step(8, 256, 256, 256), 256, 8,
     dict(group_map={(64, 512): 1})),
    ("pair 8x8 bt8", lambda: pair_step(8, 256, 256, 256), 256, 8,
     dict(bt_map={(64, 512): 8})),
    ("pair 4x4 base", lambda: pair_step(4, 256, 256, 256), 256, 4, {}),
    ("pair 4x4 v1", lambda: pair_step(4, 256, 256, 256), 256, 4,
     dict(impl_map={(16, 512): 1})),
    ("pair 4x4 bt32g9", lambda: pair_step(4, 256, 256, 256), 256, 4,
     dict(bt_map={(16, 512): 32}, group_map={(16, 512): 9})),
]


def main():
    print(f"backend={jax.default_backend()} B={B} (full-block lever A/B)")
    rng = np.random.default_rng(1)
    for label, mk, cin, s, ov in CASES:
        set_overrides(**ov)
        step = mk()
        x0 = jnp.asarray(rng.normal(size=(B, s, s, cin)) * 0.5, jnp.bfloat16)
        try:
            dt = per_app_seconds(step, x0)
            print(f"  {label:24s}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"  {label:24s}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
    set_overrides()


if __name__ == "__main__":
    main()
