"""2-D point-set toy config (reference: cld_jax/configs/default_points_config.py).

The fast end-to-end slice: synthetic olympic-rings data + ps_fmlp MLP.
"""

from gddim_tpu.configs.cld.default_cifar10 import get_default_configs


def get_config():
    config = get_default_configs()
    config.training.batch_size = 512
    config.training.n_iters = 20001
    config.training.n_jitted_steps = 10
    config.training.snapshot_freq_for_sampling = 5000
    config.training.eval_freq = 1000
    config.training.log_freq = 500

    config.data.dataset = "ps_olympic"
    config.data.dim = 2
    config.data.centered = True

    model = config.model
    model.name = "ps_fmlp"
    model.nf = 128
    model.num_layers = 4
    model.fourier_scale = 16
    model.ema_rate = 0.999
    model.nonlinearity = "swish"
    model.scale_by_sigma = False

    config.sampling.method = "deis"
    config.sampling.nfe = 20
    config.sampling.deis_order = 2
    return config
