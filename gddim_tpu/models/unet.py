"""NCSN++/DDPM++ score U-Net (reference: cld_jax/models/ncsnpp.py).

A fresh flax.linen implementation covering the reference's full config space
(fourier/positional embeddings, ddpm/biggan blocks, FIR resampling, all
progressive/progressive_input modes). Module creation order tracks the
reference so auto-numbered parameter scopes line up with legacy checkpoints.

TPU-first: NHWC throughout, optional bf16 activations (`config.model.dtype`)
with f32 parameters and f32 GroupNorm/softmax statistics.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.models import blocks as blk
from gddim_tpu.models.layers import (
    Combine,
    GaussianFourierProjection,
    conv3x3,
    default_init,
    get_act,
    get_timestep_embedding,
    group_norm,
    norm_act,
)
from gddim_tpu.models.registry import register_model

# 1/sqrt(2) as a python float: weak-typed, so bf16 residual adds stay bf16
# (np.sqrt(2.0) is a strong float64 scalar and silently promotes to f32).
_INV_SQRT2 = 0.7071067811865476


def get_sigmas(config):
    """SMLD noise levels (reference models/utils.py:69-81)."""
    return jnp.exp(
        jnp.linspace(
            jnp.log(config.model.sigma_max),
            jnp.log(config.model.sigma_min),
            config.model.num_scales,
        )
    )


def _model_dtype(config):
    name = str(getattr(config.model, "dtype", "float32")).lower()
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16, "float32": jnp.float32}[
        name
    ]


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    """NCSN++ model (reference ncsnpp.py:35-243)."""

    config: object

    @nn.compact
    def __call__(self, x, time_cond, train=True):
        config = self.config
        act = get_act(config)
        dtype = _model_dtype(config)

        # conv implementation selector (trace-time; see models/layers.py)
        from gddim_tpu.models import layers as _layers_mod

        _layers_mod.CONV3X3_IMPL = str(getattr(config.model, "conv_impl", "xla"))
        _layers_mod.FUSED_TRAIN = bool(getattr(config.model, "fused_train", False))

        nf = config.model.nf
        ch_mult = config.model.ch_mult
        num_res_blocks = config.model.num_res_blocks
        attn_resolutions = config.model.attn_resolutions
        dropout = config.model.dropout
        resamp_with_conv = config.model.resamp_with_conv
        num_resolutions = len(ch_mult)
        conditional = config.model.conditional
        fir = config.model.fir
        fir_kernel = tuple(config.model.fir_kernel)
        skip_rescale = config.model.skip_rescale
        resblock_type = config.model.resblock_type.lower()
        progressive = config.model.progressive.lower()
        progressive_input = config.model.progressive_input.lower()
        embedding_type = config.model.embedding_type.lower()
        init_scale = config.model.init_scale
        combine_method = config.model.progressive_combine.lower()
        attention_impl = str(getattr(config.model, "attention_impl", "auto"))
        assert progressive in ("none", "output_skip", "residual")
        assert progressive_input in ("none", "input_skip", "residual")
        assert embedding_type in ("fourier", "positional")

        combiner = functools.partial(Combine, method=combine_method, dtype=dtype)

        # --- time embedding ------------------------------------------------
        if embedding_type == "fourier":
            assert config.training.continuous
            used_sigmas = time_cond
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=config.model.fourier_scale
            )(jnp.log(used_sigmas))
        else:
            timesteps = time_cond
            sigmas = get_sigmas(config)
            used_sigmas = sigmas[time_cond.astype(jnp.int32)]
            temb = get_timestep_embedding(timesteps, nf)

        if conditional:
            temb = nn.Dense(nf * 4, kernel_init=default_initializer(), dtype=dtype)(
                temb.astype(dtype)
            )
            temb = nn.Dense(nf * 4, kernel_init=default_initializer(), dtype=dtype)(
                act(temb)
            )
        else:
            temb = None

        AttnBlock = functools.partial(
            blk.AttnBlockpp,
            init_scale=init_scale,
            skip_rescale=skip_rescale,
            dtype=dtype,
            attention_impl=attention_impl,
        )
        Up = functools.partial(
            blk.Upsample,
            with_conv=resamp_with_conv,
            fir=fir,
            fir_kernel=fir_kernel,
            dtype=dtype,
        )
        Down = functools.partial(
            blk.Downsample,
            with_conv=resamp_with_conv,
            fir=fir,
            fir_kernel=fir_kernel,
            dtype=dtype,
        )
        if progressive == "output_skip":
            pyramid_upsample = functools.partial(
                blk.Upsample, fir=fir, fir_kernel=fir_kernel, with_conv=False, dtype=dtype
            )
        elif progressive == "residual":
            pyramid_upsample = functools.partial(
                blk.Upsample, fir=fir, fir_kernel=fir_kernel, with_conv=True, dtype=dtype
            )
        if progressive_input == "input_skip":
            pyramid_downsample = functools.partial(
                blk.Downsample, fir=fir, fir_kernel=fir_kernel, with_conv=False, dtype=dtype
            )
        elif progressive_input == "residual":
            pyramid_downsample = functools.partial(
                blk.Downsample, fir=fir, fir_kernel=fir_kernel, with_conv=True, dtype=dtype
            )

        # optional rematerialization: recompute res-block activations in the
        # backward pass (HBM for FLOPs trade, enables larger per-chip batch).
        # remat=True: full block recompute. remat='convs': selective — conv
        # outputs (the FLOP-heavy ops, tagged 'conv_out' in layers.Conv) stay
        # resident, only the cheap norm/act chain recomputes.
        remat_cfg = getattr(config.model, "remat", False)
        remat = bool(remat_cfg)
        if resblock_type == "ddpm":
            block_cls = blk.ResnetBlockDDPMpp
            block_kwargs = dict(
                act=act,
                dropout=dropout,
                init_scale=init_scale,
                skip_rescale=skip_rescale,
                dtype=dtype,
            )
        elif resblock_type == "biggan":
            block_cls = blk.ResnetBlockBigGANpp
            block_kwargs = dict(
                act=act,
                dropout=dropout,
                fir=fir,
                fir_kernel=fir_kernel,
                init_scale=init_scale,
                skip_rescale=skip_rescale,
                dtype=dtype,
            )
        else:
            raise ValueError(f"resblock type {resblock_type} unrecognized")
        if remat:
            orig_name = block_cls.__name__
            remat_kw = {}
            if str(remat_cfg) == "convs":
                # saving post-dropout activations as well skips the dropout
                # PRNG + GN2/SiLU recompute in the backward (the masks are
                # already materialized by the forward; keeping them costs
                # HBM capacity, not an extra pass). Measured +4% step time
                # at B=128; the extra residency OOMs the flagship at B=256 —
                # remat='convs_lean' keeps the conv-only policy for that.
                remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "drop_out"
                )
            elif str(remat_cfg) == "convs_lean":
                remat_kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "conv_out"
                )
            block_cls = nn.remat(block_cls, static_argnums=(3,), **remat_kw)
            # keep the original scope name so the parameter tree (and thus
            # checkpoints) are identical with remat on or off
            block_cls.__name__ = orig_name
        ResnetBlock = functools.partial(block_cls, **block_kwargs)

        if not config.data.centered:
            x = 2 * x - 1.0  # inputs in [0,1] -> [-1,1] (reference :136-138)
        x = x.astype(dtype)

        # --- downsampling path ------------------------------------------------
        input_pyramid = None
        if progressive_input != "none":
            input_pyramid = x

        hs = [conv3x3(x, nf, dtype=dtype)]
        for i_level in range(num_resolutions):
            for _ in range(num_res_blocks):
                h = ResnetBlock(out_ch=nf * ch_mult[i_level])(hs[-1], temb, train)
                if h.shape[1] in attn_resolutions:
                    h = AttnBlock()(h, train=train)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if resblock_type == "ddpm":
                    h = Down()(hs[-1], train=train)
                else:
                    h = ResnetBlock(down=True)(hs[-1], temb, train)
                if progressive_input == "input_skip":
                    input_pyramid = pyramid_downsample()(input_pyramid, train=train)
                    h = combiner()(input_pyramid, h)
                elif progressive_input == "residual":
                    input_pyramid = pyramid_downsample(out_ch=h.shape[-1])(
                        input_pyramid, train=train
                    )
                    if skip_rescale:
                        input_pyramid = (input_pyramid + h) * _INV_SQRT2
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- middle -----------------------------------------------------------
        h = hs[-1]
        h = ResnetBlock()(h, temb, train)
        h = AttnBlock()(h, train=train)
        h = ResnetBlock()(h, temb, train)

        pyramid = None

        # --- upsampling path ----------------------------------------------------
        for i_level in reversed(range(num_resolutions)):
            for _ in range(num_res_blocks + 1):
                # (h, skip) passed as a pair: the fused inference path reads
                # the two refs directly instead of materializing the concat
                # in HBM (gddim_tpu/models/blocks.py); all other paths
                # concatenate inside the block, so params/semantics match.
                h = ResnetBlock(out_ch=nf * ch_mult[i_level])(
                    (h, hs.pop()), temb, train
                )
            if h.shape[1] in attn_resolutions:
                h = AttnBlock()(h, train=train)

            if progressive != "none":
                if i_level == num_resolutions - 1:
                    if progressive == "output_skip":
                        pyramid = conv3x3(
                            norm_act(h, act),
                            x.shape[-1],
                            bias=True,
                            init_scale=init_scale,
                            dtype=dtype,
                        )
                    else:  # residual
                        pyramid = conv3x3(
                            norm_act(h, act), h.shape[-1], bias=True, dtype=dtype
                        )
                else:
                    if progressive == "output_skip":
                        pyramid = pyramid_upsample()(pyramid, train=train)
                        pyramid = pyramid + conv3x3(
                            norm_act(h, act),
                            x.shape[-1],
                            bias=True,
                            init_scale=init_scale,
                            dtype=dtype,
                        )
                    else:  # residual
                        pyramid = pyramid_upsample(out_ch=h.shape[-1])(pyramid, train=train)
                        if skip_rescale:
                            pyramid = (pyramid + h) * _INV_SQRT2
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if resblock_type == "ddpm":
                    h = Up()(h, train=train)
                else:
                    h = ResnetBlock(up=True)(h, temb, train)

        assert not hs

        if progressive == "output_skip":
            h = pyramid
        else:
            h = norm_act(h, act)
            h = conv3x3(h, x.shape[-1], init_scale=init_scale, dtype=dtype)

        h = h.astype(jnp.float32)
        if config.model.scale_by_sigma:
            used = used_sigmas.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
            h = h / used
        return h


def default_initializer():
    return default_init()
