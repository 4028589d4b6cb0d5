"""In-kernel 3x3 conv strategy A/B at model shapes (round-4 ceiling work).

The slope probe (`exp_shape_pure.py`) shows the MXU's MARGINAL int8 rate at
K=N=128 is ~260-530 TOP/s — the old 126-144 "shape wall" was per-link fixed
overhead, not arithmetic. The production `_conv9` (gather form: 9 shifted
window slices of the padded VMEM tile, each reshaped to (M, K) for its
matmul) measures ~0.44 us per matmul at the 32x32 level vs the ~0.26 us
pure rate — the difference is the strided-window relayout Mosaic emits for
every tap. Strategies that avoid the per-tap input relayout:

  A  gather (production): 9 shifted-input matmuls, N=cout.
  B  scatter: ONE contiguous matmul X @ [W0..W8] (N=9*cout, lane-aligned
     slices), then 9 shifted adds into a padded int32 output scratch —
     the shifts move to the VPU add side where no matmul layout is needed.
  C  row hybrid: 3 h-shifted matmuls (contiguous rows, N=3*cout) with the
     dx-sum done by 3 shifted VPU adds each — halves the relayout count
     and widens N to 384.

All strategies produce identical int32 accumulators (same-padding 3x3).
Timed with delta-K differenced chains (scripts/_timing.per_app_seconds).
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import per_app_seconds
from gddim_tpu.ops.resblock import _conv9


def _kernel(x_ref, w_ref, o_ref, hpad_ref, opad_ref, *, bt, h, w, c,
            strategy):
    """One int8 3x3 conv (c -> c) per application; in/out (bt, h*w, c) int8."""

    if strategy in ("A", "C"):
        # the B strategies never touch the padded input scratch: the matmul
        # runs on the contiguous tile directly

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            hpad_ref[...] = jnp.zeros_like(hpad_ref)

        hpad_ref[:, 1 : h + 1, 1 : w + 1, :] = x_ref[...].reshape(bt, h, w, c)

    if strategy == "A":
        acc = _conv9(hpad_ref, w_ref, bt, h, w, c, c, jnp.int8)
    elif strategy == "B":
        # one contiguous matmul over the UNPADDED tile, taps along N
        x2d = x_ref[...].reshape(bt * h * w, c)
        y = jax.lax.dot_general(
            x2d, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # scatter: out[b, oy, ox] += Y[b, oy+dy-1, ox+dx-1, tap]
        out = jnp.zeros((bt, h, w, c), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                tap = dy * 3 + dx
                yt = y[:, tap * c : (tap + 1) * c].reshape(bt, h, w, c)
                oy0, oy1 = max(0, 1 - dy), h - max(0, dy - 1)
                ox0, ox1 = max(0, 1 - dx), w - max(0, dx - 1)
                iy0, ix0 = oy0 + dy - 1, ox0 + dx - 1
                sl = yt[:, iy0 : iy0 + (oy1 - oy0), ix0 : ix0 + (ox1 - ox0), :]
                out = out + jax.lax.pad(
                    sl, jnp.int32(0),
                    ((0, 0, 0), (oy0, h - oy1, 0), (ox0, w - ox1, 0), (0, 0, 0)),
                )
        acc = out.reshape(bt * h * w, c)
    elif strategy == "B2":
        # scatter via padded output scratch ref (+= on shifted ref slices)
        x2d = x_ref[...].reshape(bt * h * w, c)
        y = jax.lax.dot_general(
            x2d, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        opad_ref[...] = jnp.zeros_like(opad_ref)
        for dy in range(3):
            for dx in range(3):
                tap = dy * 3 + dx
                yt = y[:, tap * c : (tap + 1) * c].reshape(bt, h, w, c)
                # out position = in position - (dy-1, dx-1); padded coords +1
                opad_ref[:, 2 - dy : 2 - dy + h, 2 - dx : 2 - dx + w, :] = (
                    opad_ref[:, 2 - dy : 2 - dy + h, 2 - dx : 2 - dx + w, :]
                    + yt
                )
        acc = opad_ref[:, 1 : h + 1, 1 : w + 1, :].reshape(bt * h * w, c)
    elif strategy == "C":
        # 3 h-shifted matmuls (rows stay contiguous), dx handled by VPU adds
        out = jnp.zeros((bt, h, w, c), jnp.int32)
        for dy in range(3):
            rows = hpad_ref[:, dy : dy + h, :, :]  # (bt, h, w+2, c)
            r2d = rows.reshape(bt * h * (w + 2), c)
            y = jax.lax.dot_general(
                r2d, w_ref[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(bt, h, w + 2, 3 * c)
            for dx in range(3):
                out = out + y[:, :, dx : dx + w, dx * c : (dx + 1) * c]
        acc = out.reshape(bt * h * w, c)
    else:
        raise ValueError(strategy)

    o_ref[...] = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8).reshape(
        bt, h * w, c
    )


def conv(x, w, strategy, bt):
    b, hw, c = x.shape
    h = w_ = int(np.sqrt(hw))
    kernel = functools.partial(
        _kernel, bt=bt, h=h, w=w_, c=c, strategy=strategy
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.VMEM((bt, h + 2, w_ + 2, c), jnp.int8)]
    scratch.append(
        pltpu.VMEM((bt, h + 2, w_ + 2, c), jnp.int32)
        if strategy == "B2"
        else None
    )
    if scratch[-1] is None:
        # keep the kernel signature fixed: pass a 1-element dummy
        scratch[-1] = pltpu.VMEM((1,), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(w.shape),
        ],
        out_specs=pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
        scratch_shapes=scratch,
    )(x, w)


def pack_w(w9, strategy):
    """w9: (9, c, c) int8 -> strategy-specific weight layout."""
    if strategy == "A":
        return w9
    if strategy in ("B", "B2"):
        return jnp.concatenate(list(w9), axis=1)  # (c, 9c)
    if strategy == "C":
        return jnp.stack(
            [jnp.concatenate([w9[dy * 3 + dx] for dx in range(3)], axis=1)
             for dy in range(3)]
        )  # (3, c, 3c)
    raise ValueError(strategy)


def main():
    b = 64
    print(f"backend={jax.default_backend()} B={b}", flush=True)
    rng = np.random.default_rng(0)
    # bt=4 at 16x16 keeps strategy B's (M, 9c) int32 intermediate under the
    # 16 MB scoped-VMEM limit; production uses bt=8 there, so B's verdict at
    # 16x16 is indicative, not apples-to-apples
    for s, c, bt in [(32, 128, 2), (16, 256, 4)]:
        hw = s * s
        x0 = jnp.asarray(rng.integers(-40, 41, (b, hw, c)), jnp.int8)
        w9 = jnp.asarray(rng.integers(-3, 4, (9, c, c)), jnp.int8)
        gf = 2 * b * hw * 9 * c * c / 1e9
        ref = None
        for strategy in ("A", "B", "B2", "C"):
            wq = pack_w(w9, strategy)
            try:
                f = lambda xx: conv(xx, wq, strategy, bt)
                out = np.asarray(jax.jit(f)(x0))
                if ref is None:
                    ref = out
                ok = "OK" if np.array_equal(out, ref) else "MISMATCH"
                dt = per_app_seconds(f, x0, k_small=32, k_large=512, reps=4)
                print(
                    f"{s:2d}x{s:2d} c={c} {strategy:2s}: {dt*1e3:7.3f} ms"
                    f" {gf/dt/1e3:7.1f} TOP/s-eq  [{ok}]",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).split("\n")[0][:200]
                print(f"{s:2d}x{s:2d} c={c} {strategy:2s}: FAILED {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
