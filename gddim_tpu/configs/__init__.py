"""Config registry: named configs resolving to ml_collections.ConfigDict.

The config tree mirrors the reference's sections and leaf names
(training/sampling/eval/data/model/optim — cld_jax/configs/*.py), so
`--config.sampling.nfe=50`-style overrides translate 1:1.
"""

from __future__ import annotations

import importlib

_CONFIGS = {
    # cld package
    "cld/default_cifar10": "gddim_tpu.configs.cld.default_cifar10",
    "cld/accr_dcifar10": "gddim_tpu.configs.cld.accr_dcifar10",
    "cld/deep_cifar10": "gddim_tpu.configs.cld.deep_cifar10",
    "cld/ndeep_cifar10": "gddim_tpu.configs.cld.ndeep_cifar10",
    "cld/ddpmpp_cifar10": "gddim_tpu.configs.cld.ddpmpp_cifar10",
    "cld/simple_cifar10": "gddim_tpu.configs.cld.simple_cifar10",
    "cld/calib_cifar10": "gddim_tpu.configs.cld.calib_cifar10",
    "cld/ddpmpp_celeba": "gddim_tpu.configs.cld.ddpmpp_celeba",
    "cld/points": "gddim_tpu.configs.cld.points",
    # blur package
    "blur/default_cifar10": "gddim_tpu.configs.blur.default_cifar10",
    "blur/ddpm_deep_cifar10": "gddim_tpu.configs.blur.ddpm_deep_cifar10",
    "blur/ddpmpp_cifar10": "gddim_tpu.configs.blur.ddpmpp_cifar10",
    "blur/simple_cifar10": "gddim_tpu.configs.blur.simple_cifar10",
    "blur/debug_cifar10": "gddim_tpu.configs.blur.debug_cifar10",
}


def get_config(name: str):
    """Load a named config ('cld/accr_dcifar10') or a module path."""
    key = name.removesuffix(".py").removesuffix("_config")
    if key in _CONFIGS:
        mod = importlib.import_module(_CONFIGS[key])
    else:
        mod = importlib.import_module(name)
    return mod.get_config()


def available_configs():
    return tuple(sorted(_CONFIGS))
