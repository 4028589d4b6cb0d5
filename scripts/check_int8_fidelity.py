"""Sampling fidelity of the quantized path: bf16 vs fused_int8 samples.

Same seed, same (random-init) weights, full NFE=50 deis-2 sampling. Reports
per-pixel correlation and moment deltas between the two paths. With trained
weights this should be repeated before shipping int8-scored FIDs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import bench


def main():
    stats = {}
    for conv in ["fused", "fused_int8"]:
        config = bench._build_config("opt", smoke=jax.default_backend() == "cpu",
                                     conv_impl=conv)
        sampler, variables = bench._sample_fn(config)
        rng = jax.random.PRNGKey(7)
        x, v, nfe = sampler(rng, variables, 64)
        stats[conv] = np.asarray(x, np.float32)
    a, b = stats["fused"], stats["fused_int8"]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    print(f"pixel corr bf16-vs-int8: {corr:.5f}")
    print(f"mean: {a.mean():.4f} vs {b.mean():.4f}  std: {a.std():.4f} vs {b.std():.4f}")
    print(f"max abs diff: {np.abs(a - b).max():.4f} (pixels in [0,1])")
    assert np.isfinite(b).all()


if __name__ == "__main__":
    main()
