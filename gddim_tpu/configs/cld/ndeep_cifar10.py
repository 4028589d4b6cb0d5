"""Deep CLD CIFAR-10 with the mixed-score parameterization
(reference: cld_jax/configs/ndeep_cifar10_config.py)."""

from gddim_tpu.configs.cld.deep_cifar10 import get_config as _deep


def get_config():
    config = _deep()
    config.model.mixed_score = True
    return config
