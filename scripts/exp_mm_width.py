"""int8 MXU rate vs contraction/output width, delta-K differenced.

Question: do K=N=128 matmuls (the 32x32/c=128 level's conv shape) sustain a
lower int8 rate than K=N=256 (the c=256 levels), independent of epilogues?
Chains f(x) = clip(x @ W) so the matmul cannot be hoisted; per-application
time comes from scripts/_timing.per_app_seconds (single-dispatch chains,
immune to the tunnel's variable per-dispatch overhead).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds


def rate(m, k, n):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-3, 4, (k, n)), jnp.int8)

    def f(x):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # fold back to int8 input shape (k columns) so the chain types match;
        # cheap VPU epilogue, identical across shapes
        y = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        if n == k:
            return y
        reps = -(-k // n)
        return jnp.tile(y, (1, reps))[:, :k]

    x0 = jnp.asarray(rng.integers(-3, 4, (m, k)), jnp.int8)
    # Round-4 correction: with per-app times of 0.3-7 us, the old
    # (512, 8192) windows put only a few ms of differenced work against
    # ~0.5 ms of tunnel/run noise — both the round-3 readings (126-144
    # TOP/s at K=N=128) and a shallow-window re-run (0.00 us / 750 TOP/s
    # nonsense cells) are unreliable. 64k-app chains make the difference
    # ~20-60x the noise floor.
    dt = per_app_seconds(f, x0, k_small=4096, k_large=65536, reps=5)
    tops = 2 * m * k * n / dt / 1e12
    print(f"M={m:5d} K={k:4d} N={n:4d}: {dt*1e6:8.2f} us  {tops:6.1f} TOP/s", flush=True)


def main():
    for m, k, n in [
        (2048, 128, 128),   # 32x32 level, bt=2
        (4096, 128, 128),   # 32x32 level, bt=4
        (2048, 256, 128),   # pair conv1 at 32x32
        (2048, 256, 256),   # 16x16 level, bt=8 (M=bt*256)
        (4096, 256, 256),
        (2048, 384, 128),   # widest pair conv1
        (2048, 1152, 128),  # im2col-deep at 32x32
    ]:
        rate(m, k, n)


if __name__ == "__main__":
    main()
