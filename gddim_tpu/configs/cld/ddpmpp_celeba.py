"""CelebA 64x64 CLD config (reference: cld_jax/configs/ddpmpp_celeba_config.py).

Field-for-field deltas from the base config mirror the reference file:
shallower net than the CIFAR release (4 res blocks, no FIR, positional
embeddings), ema_rate 0.999, and the live ema_update_freq=5000 params<-ema
swap (reference :26, consumed at run_lib.py:203-209).
"""

from gddim_tpu.configs.cld.default_cifar10 import get_default_configs


def get_config():
    config = get_default_configs()
    training = config.training
    training.n_iters = 1300001
    training.snapshot_freq = 50000
    training.log_freq = 100
    training.eval_freq = 2000
    training.snapshot_freq_for_preemption = 10000
    training.snapshot_sampling_batch = 100
    training.snapshot_freq_for_sampling = 5000
    training.ema_update_freq = 5000
    training.continuous = True
    training.reduce_mean = True

    config.data.dataset = "CELEBA"
    config.data.image_size = 64
    config.data.centered = True

    model = config.model
    model.name = "ncsnpp"
    model.scale_by_sigma = False
    model.ema_rate = 0.999
    model.normalization = "GroupNorm"
    model.nonlinearity = "swish"
    model.nf = 128
    model.ch_mult = (1, 2, 2, 2)
    model.num_res_blocks = 4
    model.attn_resolutions = (16,)
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = False
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "none"
    model.progressive_input = "none"
    model.progressive_combine = "sum"
    model.attention_type = "ddpm"
    model.init_scale = 0.0
    model.embedding_type = "positional"
    model.fourier_scale = 16
    model.conv_size = 3
    model.is_R_rk = True
    model.R_dt = 1e-5
    model.mixed_score = False
    return config
