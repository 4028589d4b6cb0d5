"""Backward-pass conv rates at model shapes: dgrad vs wgrad vs forward.

Training steps measure ~4.4x the forward (PERF.md) where a backward running
at forward rates would cost 2x. The suspect is the weight-gradient
contraction: dW[3,3,Cin,Cout] reduces over K = B*H*W with tiny M=Cin,
N=Cout outputs — a shape the MXU tiles much worse than the forward's
M = B*H*W conv. This measures each piece in isolation (delta-K chained,
single-dispatch; see scripts/_timing.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
from _timing import per_app_seconds

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, k):
    # pure-bf16 conv exactly as the train path's nn.Conv(dtype=bf16)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=DN
    )


def bench_shape(b, s, c, cout):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, s, s, c)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, c, cout)) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(b, s, s, cout)) * 0.5, jnp.bfloat16)
    gf = 2 * b * s * s * 9 * c * cout / 1e9

    def fwd(x):
        y = conv(x, k)
        return y[..., :c] if cout != c else y

    def dgrad(x):
        # conv is linear, so the input-grad at any linearization point is a
        # function of the COTANGENT only — feed the chain state as the
        # cotangent so each step performs one real dgrad conv
        _, vjp = jax.vjp(lambda xx: conv(xx, k), jnp.zeros_like(x))
        (dx,) = vjp(x.astype(dy.dtype) if cout == c else conv(x, k))
        return dx

    def wgrad(x):
        _, vjp = jax.vjp(lambda kk: conv(x, kk), k)
        (dk,) = vjp(dy)
        # fold dk back into the chain state so per-step wgrads cannot be
        # CSE'd/hoisted; the perturbation is numerically negligible
        return x * (1 + 1e-12 * jnp.tanh(dk.sum().astype(jnp.float32))).astype(x.dtype)

    for name, f in [("fwd ", fwd), ("dgrad", dgrad), ("wgrad", wgrad)]:
        dt = per_app_seconds(f, x0)
        print(
            f"B{b:3d} {s:2d}x{s:2d} {c:3d}->{cout:3d} {name}: "
            f"{dt*1e3:7.3f} ms  {gf/dt/1e3:6.1f} TF/s",
            flush=True,
        )


def main():
    print(f"backend={jax.default_backend()}")
    for b, s, c, cout in [
        (64, 32, 128, 128),
        (128, 32, 128, 128),
        (64, 16, 256, 256),
        (128, 16, 256, 256),
        (128, 8, 256, 256),
    ]:
        bench_shape(b, s, c, cout)


if __name__ == "__main__":
    main()
