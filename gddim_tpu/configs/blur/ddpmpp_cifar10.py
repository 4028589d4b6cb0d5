"""DDPM++ blur variant: 4 res-blocks (reference blur_jax ddpmpp config pattern)."""

from gddim_tpu.configs.blur.ddpm_deep_cifar10 import get_config as _deep


def get_config():
    config = _deep()
    config.model.num_res_blocks = 4
    return config
