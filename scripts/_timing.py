"""Dispatch-robust chip timing for the axon tunnel.

The tunnel's per-dispatch overhead is VARIABLE (measured ~1 ms in round 2
but ~24 ms in round 3c) — any timing that divides a small number of
dispatches by a small K inherits it. This helper removes the overhead by
differencing two chain lengths inside single dispatches:

    per_app = (T(K_large) - T(K_small)) / (K_large - K_small)

Both runs fetch one in-graph scalar (block_until_ready is a no-op through
the tunnel); min-of-reps rejects transient tunnel stalls.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _total_time(fn, x0, k, reps):
    @jax.jit
    def run(x):
        def body(h, _):
            return fn(h), None

        h, _ = jax.lax.scan(body, x, None, length=k)
        return h.astype(jnp.float32).mean()

    _ = float(np.asarray(run(x0)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(x0)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_app_seconds(fn, x0, k_small=32, k_large=256, reps=3):
    """Seconds per application of fn (chainable: fn(x) must match x's shape)."""
    t_s = _total_time(fn, x0, k_small, reps)
    t_l = _total_time(fn, x0, k_large, reps)
    return max(t_l - t_s, 1e-9) / (k_large - k_small)
