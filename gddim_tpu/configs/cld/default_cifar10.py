"""Base CLD CIFAR-10 config (reference: cld_jax/configs/default_cifar10_config.py)."""

import ml_collections


def get_default_configs():
    config = ml_collections.ConfigDict()
    config.sde = "cld"

    config.training = training = ml_collections.ConfigDict()
    config.training.batch_size = 128
    training.n_iters = 1300001
    training.snapshot_freq = 50000
    training.log_freq = 50
    training.eval_freq = 100
    training.snapshot_freq_for_preemption = 50000
    training.snapshot_sampling = True
    training.snapshot_sampling_batch = 100
    training.snapshot_freq_for_sampling = 10000
    training.likelihood_weighting = False
    training.continuous = True
    training.n_jitted_steps = 5
    training.reduce_mean = True
    training.ema_update_freq = 1e9
    # 'rbg' = TPU hardware PRNG for training streams (dropout/t/noise);
    # 'threefry' for sharding-invariant bit-exact streams (slower: the
    # flagship's dropout masks alone cost ~19% of a step under threefry)
    training.prng_impl = "rbg"

    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.n_steps_each = 1
    sampling.noise_removal = True
    sampling.probability_flow = False
    sampling.snr = 0.16
    sampling.method = "deis"
    sampling.nfe = 20
    sampling.is_em = False
    sampling.deis_order = 1
    sampling.ts_order = 2
    sampling.noise_nfe_ratio = 0.3
    sampling.img_t_ratio = 0.3
    sampling.atol = 1e-5
    sampling.rtol = 1e-5
    sampling.ode_method = "RK45"
    # reproduce the reference's buggy numerics bit-for-bit (non-monotone
    # hybdeis grid, untransposed sdeis Lyapunov) for released-artifact parity
    sampling.reference_exact = False
    sampling.lambda_coef = 1.0
    sampling.sdeis_use_order0 = True

    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.begin_ckpt = 9
    evaluate.end_ckpt = 26
    evaluate.batch_size = 1024
    evaluate.enable_sampling = False
    evaluate.num_samples = 50000
    evaluate.enable_loss = True
    evaluate.enable_bpd = False
    evaluate.bpd_dataset = "test"
    evaluate.inception_weights = ""  # optional path to Inception weights .npz
    evaluate.stats_path = ""  # dataset activation stats .npz (mu, sigma)

    config.data = data = ml_collections.ConfigDict()
    data.dataset = "CIFAR10"
    data.image_size = 32
    data.random_flip = True
    data.centered = False
    data.uniform_dequantization = False
    data.num_channels = 3
    data.data_dir = ""  # local data directory (no-network environments)
    data.synthetic = False  # synthetic image stream for smoke/bench runs

    config.model = model = ml_collections.ConfigDict()
    model.sigma_min = 0.01
    model.sigma_max = 50
    model.num_scales = 1000
    model.beta_min = 0.1
    model.beta_max = 20.0
    model.dropout = 0.1
    model.embedding_type = "fourier"
    model.m_inv = 4.0
    model.beta_0 = 4.0
    model.beta_1 = 0.0
    model.vv_gamma = 0.04
    model.mixed_score = False
    # Reference-surface knobs for the device-side R(t) integration
    # (is_R_rk/R_dt/x64/used_cache, cld_jax/sde_lib.py:48,93-118). gddim_tpu
    # supersedes that machinery: R(t) is solved on the host with adaptive
    # float64 DOP853 at rtol 1e-12 (beyond RK4@1e-6 accuracy) and cached
    # content-addressed, so these remain accepted-but-inert for config parity.
    model.is_R_rk = False
    model.R_dt = 1e-5
    model.used_cache = True
    model.x64 = False
    model.dtype = "float32"  # 'bfloat16' for the fast TPU path
    model.attention_impl = "auto"  # 'xla' | 'pallas' | 'auto'
    model.conv_impl = "xla"  # 'xla' | 'pallas' | 'int8' | 'fused' | 'fused_int8'
    # training-path whole-block fusion: fused bf16 Pallas forward +
    # XLA-recomputed backward for eligible res-blocks (TPU only; CPU and
    # ineligible widths fall through to the normal path). Round-5 chip A/B
    # (artifacts/train_ab_r5.log): 681.6 img/s vs 671.1 for the selective-
    # remat spec at b128 — the custom_vjp already keeps block interiors out
    # of HBM, so it REPLACES remat for the eligible blocks; combining both
    # measured slower (674.6).
    model.fused_train = True

    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = "Adam"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 5000
    optim.grad_clip = 1.0

    config.seed = 42

    # parallelism (TPU-native additions; 1-axis data parallel by default)
    config.mesh = mesh = ml_collections.ConfigDict()
    mesh.data_axis = -1  # -1: all devices
    mesh.fsdp_axis = 1  # ZeRO-3-shard params/moments over this many devices
    mesh.tp_axis = 1  # Megatron-style channel TP over this many devices

    return config


def get_config():
    return get_default_configs()
