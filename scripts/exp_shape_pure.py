"""Pure-MXU int8 rate at model shapes — epilogue-cost-separated.

The deep-window `exp_mm_width.py` readings (110-125 TOP/s at K=N=128 vs
347 at 8192^3) bundle a shift+clip+(tile) VPU epilogue into every chain
link; at per-app times under 1 us that epilogue can be comparable to the
matmul itself, so it cannot distinguish "the MXU has a shape wall" from
"the probe's own epilogue dominates". This probe separates them:

  - cast-only epilogue (same as the 8192^3 peak probe): y = (x @ W).s8
  - slope method: chains with 1, 2, 4 dependent matmuls per app; the
    slope d(per_app)/d(n_mm) is the pure (matmul + cast) cost with any
    fixed per-app overhead differenced out.
  - M sweep: 2048 (kernel tile M at bt=2) .. 32768 (weight-stationary
    pipelines amortize startup over more rows).

All timings delta-K differenced inside single dispatches
(scripts/_timing.per_app_seconds, deep windows).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
from _timing import per_app_seconds


def _dev_randint(key, shape, lo, hi, dtype):
    # operands created ON DEVICE: the tunnel moves host arrays at ~30 MB/s
    return jax.jit(
        lambda: jax.random.randint(jax.random.PRNGKey(key), shape, lo, hi).astype(dtype)
    )()


def rate(m, k, n_mm, k_small=4096, k_large=32768, reps=5):
    """n_mm dependent K=N=k matmuls per chain link, cast-only epilogue."""
    ws = [_dev_randint(i, (k, k), -3, 4, jnp.int8) for i in range(n_mm)]

    def f(x):
        h = x
        for w in ws:
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            h = acc.astype(jnp.int8)  # minimal epilogue: one truncating cast
        return h

    x0 = _dev_randint(99, (m, k), -3, 4, jnp.int8)
    dt = per_app_seconds(f, x0, k_small=k_small, k_large=k_large, reps=reps)
    tops = 2 * m * k * k * n_mm / dt / 1e12
    print(
        f"M={m:6d} K=N={k:4d} mm/app={n_mm}: {dt*1e6:8.3f} us"
        f"  {tops:6.1f} TOP/s (bundled)",
        flush=True,
    )
    return dt


def main():
    for k in (128, 256):
        for m in (2048, 8192, 32768):
            # deep windows scaled so each timing window is ~0.1-1 s of work
            kl = 32768 if m <= 8192 else 8192
            d1 = rate(m, k, 1, k_small=kl // 8, k_large=kl)
            d2 = rate(m, k, 2, k_small=kl // 8, k_large=kl)
            d4 = rate(m, k, 4, k_small=kl // 8, k_large=kl)
            # slope over n_mm: pure matmul+cast cost, fixed overhead removed
            slope = (d4 - d1) / 3.0
            slope2 = d2 - d1
            tops = 2 * m * k * k / slope / 1e12
            tops2 = 2 * m * k * k / max(slope2, 1e-12) / 1e12
            print(
                f"  -> pure mm+cast slope: {slope*1e6:7.3f} us = {tops:6.1f} TOP/s"
                f"   (2-1 check: {tops2:6.1f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
