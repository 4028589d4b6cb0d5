"""gDDIM-TPU: a TPU-native rebuild of the gDDIM framework (arXiv:2206.05564).

Capabilities mirror the reference `qsh-zh/gDDIM` repo (CLD + blurring diffusion,
gDDIM/DEIS multistep samplers, NCSN++/DDPM++ score models, HSM training, FID
evaluation), re-designed for TPU: host-side float64 coefficient precompute feeding
`lax.scan` sampling loops, `jax.jit` + `Mesh`/`NamedSharding` data parallelism,
and Pallas kernels for the fused hot ops.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import gddim_tpu` light)."""
    if name in ("CLD", "CLDParams", "HostCLD"):
        from gddim_tpu.math import cld, cld_host

        return {"CLD": cld.CLD, "CLDParams": cld_host.CLDParams,
                "HostCLD": cld_host.HostCLD}[name]
    if name == "BlurSDE":
        from gddim_tpu.math.blur import BlurSDE

        return BlurSDE
    if name == "run_lib":
        import importlib

        return importlib.import_module("gddim_tpu.run_lib")
    if name == "get_config":
        from gddim_tpu.configs import get_config

        return get_config
    raise AttributeError(name)
