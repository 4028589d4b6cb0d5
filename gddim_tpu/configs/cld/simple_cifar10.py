"""Smoke-test CLD CIFAR-10 config (reference: simple_cifar10_config.py, nf=32)."""

from gddim_tpu.configs.cld.accr_dcifar10 import get_config as _accr


def get_config():
    config = _accr()
    config.model.nf = 32
    config.model.num_res_blocks = 1
    config.model.ch_mult = (1, 2)
    config.model.attn_resolutions = (16,)
    config.training.batch_size = 16
    config.training.n_jitted_steps = 1
    config.data.synthetic = True
    return config
