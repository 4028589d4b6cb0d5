"""int4 / W4A8 MXU rate probe, delta-K differenced.

Question (round-4 verdict #1): does this chip run int4 matmuls faster than
int8? If the int4 (or int8-activation x int4-weight) rate is ~2x int8, W4A8
on the wide-K convs re-opens the path past the measured int8 ceiling; if it
matches int8, the "5x impossible" claim closes.

Inputs are int8 on the host (the axon platform cannot create int4 arrays
eagerly — eager convert_element_type to S4 recurses); the cast to int4
happens inside the jitted chain, BEFORE the scan, so the per-application
cost measured by delta-K is the dot itself, not the cast.

Chains f(x) = clip(acc >> 7) like exp_mm_width.py so the matmul cannot be
hoisted; per-application time via scripts/_timing.per_app_seconds.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds


def _dev_randint(key, shape, lo, hi, dtype):
    """Operand created ON DEVICE: the tunnel moves host arrays at ~30 MB/s,
    so the 64 MB peak-shape operands would stall for minutes if host-built."""
    return jax.jit(
        lambda: jax.random.randint(jax.random.PRNGKey(key), shape, lo, hi).astype(dtype)
    )()


def rate(m, k, n, a_dtype, w_dtype, k_small=512, k_large=8192, label=""):
    # values fit int4 so casting is lossless for all dtype combos
    w8 = _dev_randint(0, (k, n), -7, 8, jnp.int8)

    def f(x):
        acc = jax.lax.dot_general(
            x.astype(a_dtype),
            w8.astype(w_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = jnp.clip(acc >> 7, -7, 7).astype(jnp.int8)
        if n == k:
            return y
        reps = -(-k // n)
        return jnp.tile(y, (1, reps))[:, :k]

    x0 = _dev_randint(1, (m, k), -7, 8, jnp.int8)
    try:
        dt = per_app_seconds(f, x0, k_small=k_small, k_large=k_large, reps=3)
    except Exception as e:  # unsupported combo on this backend
        print(
            f"{label:10s} M={m:5d} K={k:4d} N={n:4d}: UNSUPPORTED"
            f" ({type(e).__name__}: {str(e)[:120]})",
            flush=True,
        )
        return None
    tops = 2 * m * k * n / dt / 1e12
    print(
        f"{label:10s} M={m:5d} K={k:4d} N={n:4d}: {dt*1e6:8.2f} us  {tops:6.1f} TOP/s",
        flush=True,
    )
    return tops


def main():
    shapes = [
        (2048, 128, 128),   # 32x32 level conv shape
        (4096, 128, 128),
        (2048, 256, 256),   # 16x16/8x8 level conv shape
        (4096, 256, 256),
        (8192, 8192, 8192, 16, 128),  # peak shape
    ]
    combos = [
        ("int8xint8", jnp.int8, jnp.int8),
        ("int4xint4", jnp.int4, jnp.int4),
        ("w4a8", jnp.int8, jnp.int4),
    ]
    for shape in shapes:
        m, k, n = shape[:3]
        ks, kl = (shape[3], shape[4]) if len(shape) == 5 else (512, 8192)
        for label, a_dt, w_dt in combos:
            rate(m, k, n, a_dt, w_dt, k_small=ks, k_large=kl, label=label)
        print(flush=True)


if __name__ == "__main__":
    main()
