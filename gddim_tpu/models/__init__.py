from gddim_tpu.models.registry import available_models, get_model, register_model

# importing the modules registers the models
from gddim_tpu.models import mlp as _mlp  # noqa: F401
from gddim_tpu.models import unet as _unet  # noqa: F401
from gddim_tpu.models.wrappers import (
    init_model,
    make_blur_eps_fn,
    make_blur_yeps_fn,
    make_cld_eps_fn,
    make_cld_score_fn,
    stack_uv_to_channels,
    unstack_channels_to_uv,
)
