"""Point-set toy model (reference: cld_jax/models/ps_fmlp.py).

MLP with Gaussian Fourier time features for 2-D point data; exercises the full
config->data->model->loss->sampler stack in seconds without image data.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gddim_tpu.models.layers import GaussianFourierProjection
from gddim_tpu.models.registry import register_model


@register_model(name="ps_fmlp")
class PSFMLP(nn.Module):
    config: object

    @nn.compact
    def __call__(self, x, time_cond, train=True):
        nf = self.config.model.nf
        temb = GaussianFourierProjection(
            embedding_size=nf, scale=self.config.model.fourier_scale
        )(jnp.log(time_cond))
        h = jnp.concatenate([x, temb], axis=-1)
        for _ in range(self.config.model.num_layers):
            h = nn.Dense(nf)(h)
            h = nn.swish(h)
        return nn.Dense(x.shape[-1])(h)
