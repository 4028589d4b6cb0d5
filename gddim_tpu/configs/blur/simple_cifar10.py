"""Smoke-test blur config (nf=32 pattern of the reference simple config)."""

from gddim_tpu.configs.blur.ddpm_deep_cifar10 import get_config as _deep


def get_config():
    config = _deep()
    config.model.nf = 32
    config.model.num_res_blocks = 1
    config.model.ch_mult = (1, 2)
    config.training.batch_size = 16
    config.training.n_jitted_steps = 1
    config.data.synthetic = True
    return config
