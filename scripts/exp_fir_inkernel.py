"""Probe: in-kernel FIR up/downsample via phase-split reshapes.

Validates the Mosaic-lowering primitives the fused transition kernel needs
(lane-dim concatenate, minor-dim-splitting rank-2 reshape, 128-aligned lane
slices) and checks numerics against models/resample.{up,down}sample_2d.
Run on the chip: interpret mode cannot catch Mosaic lowering rejections.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gddim_tpu.models import resample


def _fir_up_2d(r0, r1, r2, h, w, c, kern_h, kern_w):
    """r0/r1/r2: (h, (w+2)*c) row windows [0:h],[1:h+1],[2:h+2] of the padded
    sample, loaded SEPARATELY from the ref (a value slice at an odd sublane
    offset carries a {1,0} layout that Mosaic's concatenate rejects; fresh
    ref loads are canonically laid out). -> (2h*2w, c), factor-2 upsample.

    kern_h/kern_w: 4 floats (flipped taps, H gain folded into kern_h).
    out[2j] = kh0*x[j-1] + kh2*x[j]; out[2j+1] = kh1*x[j] + kh3*x[j+1].
    Interleave = lane-concat + minor-splitting reshape (row-major identity).
    """
    wp = r0.shape[1]  # (w+2)*c
    e = kern_h[0] * r0 + kern_h[2] * r1
    o = kern_h[1] * r1 + kern_h[3] * r2
    u = jnp.concatenate([e, o], axis=1).reshape(2 * h, wp)  # (2h, (w+2)c)
    ew = kern_w[0] * u[:, 0 : w * c] + kern_w[2] * u[:, c : (w + 1) * c]
    ow = kern_w[1] * u[:, c : (w + 1) * c] + kern_w[3] * u[:, 2 * c : (w + 2) * c]
    cat = jnp.concatenate(
        [ew.reshape(2 * h * w, c), ow.reshape(2 * h * w, c)], axis=1
    )
    return cat.reshape(4 * h * w, c)


def _fir_down_2d(p2, h, w, c, kern_h, kern_w):
    """p2: (h+2, (w+2)*c) padded sample -> (h//2*w//2, c), factor-2 down.

    out[o] = sum_a kern[a] * x[2o + a - 1] per axis (4 taps, stride 2).
    De-interleave = minor-splitting reshape + aligned lane slices.
    """
    wp = p2.shape[1]
    a01 = p2[0:h, :].reshape(h // 2, 2 * wp)
    a23 = p2[2 : h + 2, :].reshape(h // 2, 2 * wp)
    t = (
        kern_h[0] * a01[:, :wp]
        + kern_h[1] * a01[:, wp:]
        + kern_h[2] * a23[:, :wp]
        + kern_h[3] * a23[:, wp:]
    )  # (h/2, (w+2)c)
    # W de-interleave at c granularity: (h/2, (w+2)c) -> rows of (2c) pairs
    tp = t.reshape(h // 2 * (w + 2) // 2, 2 * c)
    ev = tp[:, :c].reshape(h // 2, (w + 2) // 2 * c)
    od = tp[:, c:].reshape(h // 2, (w + 2) // 2 * c)
    y = (
        kern_w[0] * ev[:, 0 : w // 2 * c]
        + kern_w[1] * od[:, 0 : w // 2 * c]
        + kern_w[2] * ev[:, c : c + w // 2 * c]
        + kern_w[3] * od[:, c : c + w // 2 * c]
    )
    return y.reshape(h // 2 * w // 2, c)


def _kernel(x_ref, o_ref, pad_ref, *, bt, h, w, c, up, kern_h, kern_w):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        pad_ref[...] = jnp.zeros_like(pad_ref)

    for s in range(bt):
        pad_ref[s, 1 : h + 1, 1 : w + 1, :] = x_ref[s].reshape(h, w, c)
        if up:
            r0 = pad_ref[s, 0:h].reshape(h, (w + 2) * c).astype(jnp.float32)
            r1 = pad_ref[s, 1 : h + 1].reshape(h, (w + 2) * c).astype(jnp.float32)
            r2 = pad_ref[s, 2 : h + 2].reshape(h, (w + 2) * c).astype(jnp.float32)
            y = _fir_up_2d(r0, r1, r2, h, w, c, kern_h, kern_w)
        else:
            p2 = pad_ref[s].reshape(h + 2, (w + 2) * c).astype(jnp.float32)
            y = _fir_down_2d(p2, h, w, c, kern_h, kern_w)
        o_ref[s] = y.astype(o_ref.dtype)


def run(up: bool, b=4, h=16, w=16, c=256, taps=(1, 3, 3, 1)):
    k1d = np.asarray(taps, np.float32)
    k1d = k1d / k1d.sum()
    kf = tuple(float(v) for v in k1d[::-1])
    if up:
        kern_h = tuple(4.0 * v for v in kf)
        n_out, hw_out = 4 * h * w, (2 * h, 2 * w)
    else:
        kern_h = kf
        n_out, hw_out = h * w // 4, (h // 2, w // 2)
    kern_w = kf
    bt = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    kernel = functools.partial(
        _kernel, bt=bt, h=h, w=w, c=c, up=up, kern_h=kern_h, kern_w=kern_w
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (bt, n_out, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_out, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bt, h + 2, w + 2, c), jnp.bfloat16)],
    )(x.reshape(b, h * w, c))
    got = np.asarray(out.reshape((b,) + hw_out + (c,)), np.float32)
    ref_fn = resample.upsample_2d if up else resample.downsample_2d
    want = np.asarray(ref_fn(x, k=taps, factor=2), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"{'up' if up else 'down'}: max rel err {err:.3e}", flush=True)
    assert err < 2e-2, err
    return err


if __name__ == "__main__":
    run(up=False)
    run(up=True)
    # odd-channel-count alignment case (c=128) and the 32x32 level
    run(up=False, h=32, w=32, c=128)
    run(up=True, h=8, w=8, c=256)
    print("OK", flush=True)
