"""gDDIM-TPU: a TPU-native rebuild of the gDDIM framework (arXiv:2206.05564).

Capabilities mirror the reference `qsh-zh/gDDIM` repo (CLD + blurring diffusion,
gDDIM/DEIS multistep samplers, NCSN++/DDPM++ score models, HSM training, FID
evaluation), re-designed for TPU: host-side float64 coefficient precompute feeding
`lax.scan` sampling loops, `jax.jit` + `Mesh`/`NamedSharding` data parallelism,
and Pallas kernels for the fused hot ops.
"""

__version__ = "0.1.0"
