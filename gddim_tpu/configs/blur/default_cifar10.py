"""Base blur-diffusion CIFAR-10 config
(reference: blur_jax/configs/default_cifar10_config.py)."""

import ml_collections


def get_default_configs():
    config = ml_collections.ConfigDict()
    config.sde = "blur"

    config.training = training = ml_collections.ConfigDict()
    config.training.batch_size = 128
    training.n_iters = 1300001
    training.snapshot_freq = 50000
    training.log_freq = 50
    training.eval_freq = 100
    training.snapshot_sampling = True
    training.snapshot_sampling_batch = 100
    training.snapshot_freq_for_sampling = 10000
    training.snapshot_freq_for_preemption = 50000
    training.likelihood_weighting = False
    training.continuous = True
    training.n_jitted_steps = 5
    training.reduce_mean = True
    training.ema_update_freq = 1e9
    # see cld/default_cifar10.py: TPU hardware PRNG for training streams
    training.prng_impl = "rbg"

    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.method = "order0"
    sampling.nfe = 50
    sampling.ts_order = 2
    sampling.t0 = 1e-5
    sampling.noise_removal = False
    # gddim_tpu extension: frequency-space DEIS (method='deis') with this
    # polynomial order — the reference only ships order0
    sampling.deis_order = 2
    # reproduce the reference's G-based eps integrand (drops the D'/D term)
    sampling.reference_exact = False

    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.begin_ckpt = 9
    evaluate.end_ckpt = 26
    evaluate.batch_size = 1024
    evaluate.enable_sampling = False
    evaluate.num_samples = 50000
    evaluate.enable_loss = True
    evaluate.enable_bpd = False
    evaluate.bpd_dataset = "test"
    evaluate.inception_weights = ""
    evaluate.stats_path = ""

    config.data = data = ml_collections.ConfigDict()
    data.dataset = "CIFAR10"
    data.image_size = 32
    data.random_flip = True
    data.centered = False
    data.uniform_dequantization = False
    data.num_channels = 3
    data.is_partial = False
    data.data_dir = ""
    data.synthetic = False

    config.model = model = ml_collections.ConfigDict()
    model.sigma_min = 0.01
    model.sigma_max = 50
    model.num_scales = 1000
    model.beta_min = 0.1
    model.beta_max = 20.0
    model.dropout = 0.1
    model.embedding_type = "fourier"
    model.sigma_blur_max = 10.0
    model.min_scale = 0.001
    model.dtype = "float32"
    model.attention_impl = "auto"
    model.fused_train = False

    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = "Adam"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 5000
    optim.grad_clip = 1.0

    config.seed = 42

    config.mesh = mesh = ml_collections.ConfigDict()
    mesh.data_axis = -1
    mesh.fsdp_axis = 1  # ZeRO-3-shard params/moments over this many devices
    mesh.tp_axis = 1  # Megatron-style channel TP over this many devices

    return config


def get_config():
    return get_default_configs()
