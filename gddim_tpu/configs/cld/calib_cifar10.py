"""Quantization-validation config: a fused-kernel-eligible small NCSN++.

nf=128 keeps every channel width a multiple of 128 so the fused int8
inference kernels (ops/resblock.py, ops/attnblock.py) actually engage —
unlike simple_cifar10 (nf=32), whose widths fall through to the unfused
path. Used to train a small model on the synthetic corpus and measure the
bf16-vs-int8 sampling fidelity on TRAINED weights
(scripts/check_int8_fidelity.py; PERF.md quantization-accuracy section).
"""

from gddim_tpu.configs.cld.accr_dcifar10 import get_config as _accr


def get_config():
    config = _accr()
    config.model.nf = 128
    config.model.num_res_blocks = 2
    config.model.ch_mult = (1, 2, 2)
    config.model.attn_resolutions = (16,)
    config.training.batch_size = 64
    config.training.n_jitted_steps = 4
    config.training.n_iters = 2001
    config.training.log_freq = 100
    config.training.eval_freq = 1000
    config.training.snapshot_freq = 1000
    config.training.snapshot_freq_for_preemption = 1000
    config.training.snapshot_freq_for_sampling = 10**9  # no mid-train sampling
    config.data.synthetic = True
    return config
