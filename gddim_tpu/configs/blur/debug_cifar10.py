"""Debug blur config: partial data, small model
(reference: blur_jax/configs/debug_cifar10_config.py)."""

from gddim_tpu.configs.blur.ddpm_deep_cifar10 import get_config as _deep


def get_config():
    config = _deep()
    training = config.training
    training.eval_freq = 500
    training.n_jitted_steps = 100
    training.snapshot_freq_for_sampling = 1000
    training.batch_size = 32
    training.snapshot_freq = 10000
    training.snapshot_freq_for_preemption = 5000

    config.data.is_partial = True
    config.data.random_flip = False

    model = config.model
    model.ema_rate = 0.5
    model.nf = 64
    model.num_res_blocks = 4
    model.fir = False
    model.progressive_input = "none"
    return config
