from gddim_tpu.samplers.timegrid import rev_time_grid, hybrid_time_grid
from gddim_tpu.samplers.factory import build_cld_sampler, CLD_SAMPLERS
