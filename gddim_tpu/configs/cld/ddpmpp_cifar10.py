"""DDPM++ CLD CIFAR-10: 4 res-blocks, positional embedding
(reference: cld_jax/configs/ddpmpp_cifar10... pattern; shallow variant)."""

from gddim_tpu.configs.cld.accr_dcifar10 import get_config as _accr


def get_config():
    config = _accr()
    config.model.num_res_blocks = 4
    config.model.embedding_type = "positional"
    config.model.fir = False
    config.model.progressive_input = "none"
    return config
