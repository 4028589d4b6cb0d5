"""CelebA 64x64 CLD config (reference: cld_jax/configs/ddpmpp_celeba_config.py)."""

from gddim_tpu.configs.cld.accr_dcifar10 import get_config as _accr


def get_config():
    config = _accr()
    config.data.dataset = "CELEBA"
    config.data.image_size = 64
    config.model.num_res_blocks = 4
    config.model.ch_mult = (1, 2, 2, 2, 4)
    config.model.attn_resolutions = (16,)
    return config
