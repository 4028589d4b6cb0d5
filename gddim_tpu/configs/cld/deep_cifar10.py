"""Deep CLD CIFAR-10 (reference: cld_jax/configs/deep_cifar10_config.py —
accr architecture with default Euler R-integration and uncentered data)."""

from gddim_tpu.configs.cld.accr_dcifar10 import get_config as _accr


def get_config():
    config = _accr()
    config.model.is_R_rk = False
    config.model.R_dt = 1e-5
    config.data.centered = False
    return config
