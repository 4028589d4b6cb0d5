"""Per-level fused-resblock rates vs the full forward: where is the slack?

Times the fused residual-block kernel standalone at each of the flagship's
level shapes (B=64), plus the fused attention block, and reconstructs the
model's forward time bottom-up from the per-level rates. Comparing the
reconstruction against the measured end-to-end forward isolates how much
time lives OUTSIDE the block kernels (transitions, resample, pyramid,
stem/head, temb, glue) — i.e. which lever still has headroom.

Timing discipline per PERF.md: K chained applications inside ONE jit,
scalar fetch to sync (the axon tunnel costs ~1.1 ms/dispatch and fetches
tensors at ~30 MB/s).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.ops.resblock import fused_resblock, fused_resblock_pair

K = 16
REPS = 4


def bench_scan(step_fn, x0, length=K, reps=REPS):
    # delta-K differencing: the tunnel's per-dispatch overhead is variable
    # (up to ~24 ms measured round 3c) and otherwise pollutes per-app times
    from _timing import per_app_seconds

    del length, reps
    return per_app_seconds(step_fn, x0)


def make_block(b, s, cin, cout, mm_dtype, static):
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, jnp.float32)
    wsk = (
        jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
        if cin != cout
        else None
    )
    temb = jnp.asarray(rng.normal(size=(b, cout)) * 0.1, jnp.float32)
    gn1s = jnp.ones((cin,), jnp.float32)
    gn1b = jnp.zeros((cin,), jnp.float32)
    gn2s = jnp.ones((cout,), jnp.float32)
    gn2b = jnp.zeros((cout,), jnp.float32)
    b1 = jnp.zeros((cout,), jnp.float32)
    b2 = jnp.zeros((cout,), jnp.float32)
    scales = (0.05, 0.05, None) if static else None

    def step(x):
        return fused_resblock(
            x, temb, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2,
            w_skip=wsk, b_skip=(b2 if wsk is not None else None),
            num_groups1=32, num_groups2=32, mm_dtype=mm_dtype,
            act_scales=scales,
        )

    return step


def gf_block(b, s, cin, cout):
    hw = s * s
    fl = 2 * b * hw * 9 * (cin * cout + cout * cout)
    if cin != cout:
        fl += 2 * b * hw * cin * cout
    return fl / 1e9


def main():
    b = 64
    mm = jnp.int8
    static = True
    print(f"backend={jax.default_backend()} B={b} mm=int8 static={static}")

    level_shapes = [
        # (s, cin, cout, n_same_blocks_in_model) — same-channel blocks
        (32, 128, 128, 15),  # L0 down 8 + up-path conv2-only equiv: counted below
        (16, 256, 256, 7),
        (8, 256, 256, 8),
        (4, 256, 256, 10),  # L3 down 8 + middle 2
    ]
    results = {}
    for s, cin, cout, _ in level_shapes:
        step = make_block(b, s, cin, cout, mm, static)
        dt = bench_scan(step, jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s, s, cin)) * 0.5,
            jnp.bfloat16,
        ))
        gf = gf_block(b, s, cin, cout)
        results[(s, cin, cout)] = dt
        print(
            f"block {s:2d}x{s:2d} {cin:3d}->{cout:3d}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:7.1f} TF/s-eq ({gf:.1f} GF)"
        )

    # widened first-blocks (down-transitions into a level / channel change)
    for s, cin, cout in [(16, 128, 256)]:
        step = make_block(b, s, cin, cout, mm, static)
        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s, s, cin)) * 0.5,
            jnp.bfloat16,
        )

        def chain(x):
            y = step(x)  # (b,s,s,cout)
            return y[..., :cin]

        dt = bench_scan(chain, x0)
        gf = gf_block(b, s, cin, cout)
        results[(s, cin, cout)] = dt
        print(
            f"block {s:2d}x{s:2d} {cin:3d}->{cout:3d}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:7.1f} TF/s-eq ({gf:.1f} GF) [chained via slice]"
        )

    # up-path two-input blocks (concat-free pair kernel)
    for s, c1, c2, cout in [(32, 128, 128, 128), (32, 256, 128, 128),
                            (16, 256, 256, 256),
                            (8, 256, 256, 256), (4, 256, 256, 256)]:
        rng = np.random.default_rng(0)
        cin = c1 + c2
        w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, jnp.float32)
        wsk = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.float32)
        temb = jnp.asarray(rng.normal(size=(b, cout)) * 0.1, jnp.float32)
        ones = lambda c: jnp.ones((c,), jnp.float32)
        zeros = lambda c: jnp.zeros((c,), jnp.float32)
        scales = (0.05, 0.05, None) if static else None

        def pair_step(xa):
            y = fused_resblock_pair(
                xa, xa[..., :c2], temb, ones(cin), zeros(cin), w1, zeros(cout),
                ones(cout), zeros(cout), w2, zeros(cout), wsk, zeros(cout),
                num_groups1=32, num_groups2=32, mm_dtype=mm,
                act_scales=scales,
            )
            if cout == c1:
                return y
            reps = -(-c1 // cout)
            return jnp.concatenate([y] * reps, axis=-1)[..., :c1]

        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s, s, c1)) * 0.5,
            jnp.bfloat16,
        )
        dt = bench_scan(pair_step, x0)
        gf = gf_block(b, s, cin, cout) + 0  # includes skip proj
        results[("pair", s, cin, cout)] = dt
        print(
            f"pair  {s:2d}x{s:2d} {cin:3d}->{cout:3d}: {dt*1e3:7.3f} ms "
            f"{gf/dt/1e3:7.1f} TF/s-eq ({gf:.1f} GF)"
        )

    # fused attention block at the model's shapes
    from gddim_tpu.ops.attnblock import fused_attnblock

    for s, c in [(16, 256), (4, 256)]:
        rng = np.random.default_rng(0)
        n = s * s
        mk = lambda *sh: jnp.asarray(rng.normal(size=sh) * 0.05, jnp.float32)
        wq, wk, wv, wo = mk(c, c), mk(c, c), mk(c, c), mk(c, c)
        gns, gnb = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)
        z = jnp.zeros((c,), jnp.float32)

        def attn_step(x):
            return fused_attnblock(
                x, gns, gnb, wq, z, wk, z, wv, z, wo, z,
                num_groups=32, mm_dtype=mm,
            )

        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s, s, c)) * 0.5,
            jnp.bfloat16,
        )
        try:
            dt = bench_scan(attn_step, x0)
            gf = (2 * b * n * c * c * 4 + 2 * b * n * n * c * 2) / 1e9
            print(
                f"attn  {s:2d}x{s:2d} c={c}: {dt*1e3:7.3f} ms "
                f"{gf/dt/1e3:7.1f} TF/s-eq ({gf:.1f} GF)"
            )
            results[("attn", s, c)] = dt
        except Exception as e:
            print(f"attn {s}: failed {type(e).__name__}: {e}")

    # ---- bottom-up reconstruction of the flagship forward (B=64) ----------
    # accr: nf=128, ch_mult=(1,2,2,2), 8 blocks/level, attn@16, middle @4
    recon = 0.0
    parts = []

    def add(name, key, count):
        nonlocal recon
        t = results[key] * count
        recon += t
        parts.append((name, count, t))

    add("down 32x32 128", (32, 128, 128), 8)
    add("down 16x16 first", (16, 128, 256), 1)
    add("down 16x16 rest", (16, 256, 256), 7)
    add("down 8x8", (8, 256, 256), 8)
    add("down 4x4 + middle", (4, 256, 256), 10)
    add("up 4x4 pair", ("pair", 4, 512, 256), 9)
    add("up 8x8 pair", ("pair", 8, 512, 256), 9)
    add("up 16x16 pair", ("pair", 16, 512, 256), 9)
    add("up 32x32 first", ("pair", 32, 384, 128), 1)
    add("up 32x32 rest", ("pair", 32, 256, 128), 8)
    if ("attn", 16, 256) in results:
        add("attn 16x16", ("attn", 16, 256), 9)  # 8 down + 1 up
        add("attn 4x4", ("attn", 4, 256), 1)
    for name, count, t in parts:
        print(f"  {name:20s} x{count:2d}: {t*1e3:7.2f} ms")
    print(f"reconstructed block time: {recon*1e3:.2f} ms")
    print("(transition blocks / FIR / stem / head / pyramid / temb are the"
          " remainder vs the measured full forward — bench_forward.py)")


if __name__ == "__main__":
    main()
