"""Model zoo tests: shapes, param structure, wrappers, bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.math.cld import CLD
from gddim_tpu.math.cld_host import CLDParams
from gddim_tpu.models import (
    get_model,
    init_model,
    make_cld_eps_fn,
    stack_uv_to_channels,
    unstack_channels_to_uv,
)


def small_cld_config():
    cfg = get_config("cld/simple_cifar10")
    cfg.data.image_size = 16
    cfg.model.attn_resolutions = (8,)
    return cfg


def test_channel_stacking_roundtrip():
    u = jnp.arange(2 * 4 * 4 * 3 * 2, dtype=jnp.float32).reshape(2, 4, 4, 3, 2)
    h = stack_uv_to_channels(u)
    assert h.shape == (2, 4, 4, 6)
    # order: [x-ch0, x-ch1, x-ch2, v-ch0, v-ch1, v-ch2] ("(g d)" grouping)
    np.testing.assert_allclose(np.asarray(h[..., :3]), np.asarray(u[..., 0]))
    np.testing.assert_allclose(np.asarray(h[..., 3:]), np.asarray(u[..., 1]))
    back = unstack_channels_to_uv(h)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u))


def test_ncsnpp_init_and_forward():
    cfg = small_cld_config()
    rng = jax.random.PRNGKey(0)
    model, state, params = init_model(rng, cfg)
    b = 2
    x = jnp.zeros((b, 16, 16, 6))
    t = jnp.ones((b,)) * 0.5
    out = model.apply({"params": params, **state}, x, t * 999, train=False, mutable=False)
    assert out.shape == x.shape
    assert jnp.isfinite(out).all()


def test_ncsnpp_dropout_needs_rng():
    cfg = small_cld_config()
    # init_scale=0 zeroes every post-dropout conv at init (reference default),
    # which would mask dropout; use a non-degenerate init for this test.
    cfg.model.init_scale = 1.0
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    t = jnp.ones((2,)) * 500.0
    out1 = model.apply(
        {"params": params, **state},
        x,
        t,
        train=True,
        mutable=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    out2 = model.apply(
        {"params": params, **state},
        x,
        t,
        train=True,
        mutable=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_cld_eps_wrapper_and_mixed_score():
    cfg = small_cld_config()
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    sde = CLD.create(CLDParams(), mixed_score=False)
    eps_apply = make_cld_eps_fn(sde, model, train=False)
    u = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3, 2))
    t = jnp.asarray([0.3, 0.7])
    eps = eps_apply({"params": params, **state}, u, t)
    assert eps.shape == u.shape

    sde_ms = CLD.create(CLDParams(), mixed_score=True)
    eps_apply_ms = make_cld_eps_fn(sde_ms, model, train=False)
    eps_ms = eps_apply_ms({"params": params, **state}, u, t)
    # mixed-score adds invR(t) @ [0, v]
    from gddim_tpu.math.linalg2 import bmm, inv2

    extra = bmm(inv2(sde.R(t)), u.at[..., 0].set(0.0))
    np.testing.assert_allclose(
        np.asarray(eps_ms), np.asarray(eps + extra), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_flagship_architecture_builds():
    """accr_dcifar10: 8 biggan blocks, FIR, progressive_input=residual."""
    cfg = get_config("cld/accr_dcifar10")
    cfg.model.nf = 16  # shrink width only; keep depth/structure
    cfg.model.num_res_blocks = 2
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 32, 32, 6))
    out = model.apply(
        {"params": params, **state}, x, jnp.ones((1,)), train=False, mutable=False
    )
    assert out.shape == x.shape
    # parameter tree uses reference-compatible auto-numbered scope names
    names = set(params.keys())
    assert "GaussianFourierProjection_0" in names
    assert "Dense_0" in names and "Dense_1" in names
    assert "Conv_0" in names and "Conv_1" in names
    assert any(n.startswith("ResnetBlockBigGANpp_") for n in names)
    assert any(n.startswith("AttnBlockpp_") for n in names)
    assert any(n.startswith("Downsample_") for n in names)
    assert "GroupNorm_0" in names


def test_bfloat16_path():
    cfg = small_cld_config()
    cfg.model.dtype = "bfloat16"
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    # params stay f32
    leaf_dtypes = {str(x.dtype) for x in jax.tree.leaves(params)}
    assert leaf_dtypes == {"float32"}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    out = model.apply(
        {"params": params, **state}, x, jnp.ones((2,)) * 500, train=False, mutable=False
    )
    assert out.dtype == jnp.float32  # head casts back
    assert jnp.isfinite(out).all()
    # bf16 output tracks the f32 output
    cfg32 = small_cld_config()
    model32, state32, params32 = init_model(jax.random.PRNGKey(0), cfg32)
    out32 = model32.apply(
        {"params": params32, **state32},
        x,
        jnp.ones((2,)) * 500,
        train=False,
        mutable=False,
    )
    rel = np.abs(np.asarray(out) - np.asarray(out32)).max() / (
        np.abs(np.asarray(out32)).max() + 1e-8
    )
    assert rel < 0.1


def test_ps_fmlp():
    cfg = get_config("cld/points")
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    out = model.apply({"params": params, **state}, x, jnp.ones((8,)), train=False, mutable=False)
    assert out.shape == (8, 4)


def test_ddpm_resblock_and_positional_embedding():
    cfg = get_config("cld/ddpmpp_cifar10")
    cfg.model.nf = 16
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = (1, 2)
    cfg.model.resblock_type = "ddpm"
    cfg.data.image_size = 16
    cfg.model.attn_resolutions = (8,)
    model, state, params = init_model(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 16, 16, 6))
    out = model.apply(
        {"params": params, **state}, x, jnp.ones((1,)) * 500, train=False, mutable=False
    )
    assert out.shape == x.shape


@pytest.mark.slow
def test_progressive_modes_build():
    for progressive, progressive_input in [
        ("output_skip", "input_skip"),
        ("residual", "residual"),
    ]:
        cfg = small_cld_config()
        cfg.model.progressive = progressive
        cfg.model.progressive_input = progressive_input
        cfg.model.progressive_combine = "cat" if progressive_input == "input_skip" else "sum"
        model, state, params = init_model(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 16, 16, 6))
        out = model.apply(
            {"params": params, **state}, x, jnp.ones((1,)), train=False, mutable=False
        )
        assert out.shape == x.shape, (progressive, progressive_input)


def test_legacy_ncsn_blocks():
    """NCSNv1/v2-era RefineNet blocks (inventory parity with reference
    layers.py:117-441,496-568) build and preserve shapes."""
    import flax.linen as nn
    from gddim_tpu.models import legacy_blocks as lb

    x = jnp.ones((2, 16, 16, 32))
    for mod in [lb.CRPBlock(32, 2), lb.RCUBlock(32, 2, 2), lb.LegacyAttnBlock()]:
        out, _ = mod.init_with_output(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
    xs = [jnp.ones((2, 8, 8, 64)), jnp.ones((2, 16, 16, 32))]
    out, _ = lb.RefineBlock(32, (16, 16)).init_with_output(jax.random.PRNGKey(0), xs)
    assert out.shape == (2, 16, 16, 32)
    rb = lb.LegacyResnetBlockDDPM(act=nn.relu, out_ch=64)
    out, _ = rb.init_with_output(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        jnp.ones((2, 128)),
    )
    assert out.shape == (2, 16, 16, 64)


def test_legacy_ncsnv1_conditional_blocks():
    """Noise-conditional NCSNv1 RefineNet variants (reference
    layers.py:135-310): thread the noise-level index y through a
    conditional normalizer; start block bypasses MSF."""
    import functools

    from gddim_tpu.models import legacy_blocks as lb
    from gddim_tpu.models.normalization import ConditionalInstanceNorm2dPlus

    norm = functools.partial(ConditionalInstanceNorm2dPlus, num_classes=10)
    x = jnp.ones((2, 16, 16, 32))
    y = jnp.array([1, 7])
    for mod in [
        lb.CondCRPBlock(32, 2, norm),
        lb.CondRCUBlock(32, 2, 2, norm),
    ]:
        out, _ = mod.init_with_output(jax.random.PRNGKey(0), x, y)
        assert out.shape == x.shape
    xs = [jnp.ones((2, 8, 8, 64)), jnp.ones((2, 16, 16, 32))]
    out, _ = lb.CondMSFBlock(32, (16, 16), norm).init_with_output(
        jax.random.PRNGKey(0), xs, y
    )
    assert out.shape == (2, 16, 16, 32)
    out, _ = lb.CondRefineBlock(32, (16, 16), norm).init_with_output(
        jax.random.PRNGKey(0), xs, y
    )
    assert out.shape == (2, 16, 16, 32)
    # start block: single input, MSF bypassed (h = hs[0], reference :305-307)
    out, _ = lb.CondRefineBlock(
        64, (8, 8), norm, start=True
    ).init_with_output(jax.random.PRNGKey(0), [jnp.ones((2, 8, 8, 64))], y)
    assert out.shape == (2, 8, 8, 64)


@pytest.mark.slow
def test_wideresnet_classifier_and_guidance():
    from gddim_tpu.models.wideresnet import (
        create_classifier,
        get_classifier_grad_fn,
        get_logit_fn,
    )

    clf, params = create_classifier(jax.random.PRNGKey(0), batch_size=2)
    logit_fn = get_logit_fn(clf, params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    sig = jnp.ones((2,)) * 0.5
    logits = logit_fn(x, sig)
    assert logits.shape == (2, 10)
    grad_fn = get_classifier_grad_fn(logit_fn)
    g = grad_fn(x, sig, jnp.asarray([3, 7]))
    assert g.shape == x.shape
    assert jnp.isfinite(g).all()


@pytest.mark.slow
def test_full_model_fused_impl_matches_normal():
    """The whole NCSN++ under conv_impl='fused' (megakernel resblocks +
    attention) matches the composable-module forward on identical params —
    guards the scope-name wiring (GroupNorm_0/Conv_0/Dense_0/NIN_*) at the
    model level, not just per block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.configs import get_config
    from gddim_tpu.models import init_model, make_cld_eps_fn
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import layers
    from gddim_tpu.ops import attnblock as ab, resblock as rb

    cfg = get_config("cld/simple_cifar10")
    cfg.data.image_size = 16
    cfg.model.nf = 128  # fusion requires 128-multiple channels
    cfg.model.ch_mult = (1,)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (16,)
    model, mstate, params = init_model(jax.random.PRNGKey(0), cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    v = {"params": params, **mstate}
    u = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3, 2)), jnp.float32
    )
    t = jnp.full((2,), 0.5, jnp.float32)
    ref = np.asarray(eps(v, u, t))

    old_impl = layers.CONV3X3_IMPL
    old_rb, old_ab, old_mm = rb.supported, ab.supported, rb.MM_DTYPE
    try:
        layers.CONV3X3_IMPL = "fused"
        rb.MM_DTYPE = jnp.float32
        rb.supported = lambda shape, cout: (
            shape[-1] % 128 == 0 and cout % 128 == 0
        )
        ab.supported = lambda shape: (
            shape[-1] % 128 == 0 and (shape[1] * shape[2]) % 128 == 0
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(eps(v, u, t))
    finally:
        layers.CONV3X3_IMPL = old_impl
        rb.supported, ab.supported, rb.MM_DTYPE = old_rb, old_ab, old_mm
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


@pytest.mark.slow
def test_full_model_fused_v2_matches_normal():
    """Same model-level gate as test_full_model_fused_impl_matches_normal
    but with the loop-free kernel bodies (RESBLOCK_IMPL='v2')."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.configs import get_config
    from gddim_tpu.models import init_model, make_cld_eps_fn
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import layers
    from gddim_tpu.ops import attnblock as ab, resblock as rb

    cfg = get_config("cld/simple_cifar10")
    cfg.data.image_size = 16
    cfg.model.nf = 128
    cfg.model.ch_mult = (1, 2)  # include a transition + pair path
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (16,)
    model, mstate, params = init_model(jax.random.PRNGKey(0), cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    v = {"params": params, **mstate}
    u = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3, 2)), jnp.float32
    )
    t = jnp.full((2,), 0.5, jnp.float32)
    ref = np.asarray(eps(v, u, t))

    old_impl = layers.CONV3X3_IMPL
    old_rb, old_ab, old_mm = rb.supported, ab.supported, rb.MM_DTYPE
    old_v = rb.RESBLOCK_IMPL
    try:
        layers.CONV3X3_IMPL = "fused"
        rb.RESBLOCK_IMPL = "v2"
        rb.MM_DTYPE = jnp.float32
        rb.supported = lambda shape, cout: (
            shape[-1] % 128 == 0 and cout % 128 == 0
        )
        ab.supported = lambda shape: (
            shape[-1] % 128 == 0 and (shape[1] * shape[2]) % 8 == 0
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(eps(v, u, t))
    finally:
        layers.CONV3X3_IMPL = old_impl
        rb.supported, ab.supported, rb.MM_DTYPE = old_rb, old_ab, old_mm
        rb.RESBLOCK_IMPL = old_v
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_full_model_fused_v2_scatter_matches_normal():
    """Model-level gate for the scatter-form in-kernel conv
    (GDDIM_CONV9_IMPL=scatter, round-4 MXU-relayout lever): the whole
    NCSN++ with v2 bodies + scatter convs through single, pair, tail and
    attention paths must match the unfused composition."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.configs import get_config
    from gddim_tpu.models import init_model, make_cld_eps_fn
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import layers
    from gddim_tpu.ops import attnblock as ab, resblock as rb

    cfg = get_config("cld/simple_cifar10")
    cfg.data.image_size = 16
    cfg.model.nf = 128
    cfg.model.ch_mult = (1, 2)  # include a transition + pair path
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (16,)
    model, mstate, params = init_model(jax.random.PRNGKey(0), cfg)
    sde = CLD.from_config(cfg)
    eps = make_cld_eps_fn(sde, model, train=False)
    v = {"params": params, **mstate}
    u = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3, 2)), jnp.float32
    )
    t = jnp.full((2,), 0.5, jnp.float32)
    ref = np.asarray(eps(v, u, t))

    old_impl = layers.CONV3X3_IMPL
    old_rb, old_ab, old_mm = rb.supported, ab.supported, rb.MM_DTYPE
    old_v, old_c9 = rb.RESBLOCK_IMPL, rb.CONV9_IMPL
    try:
        layers.CONV3X3_IMPL = "fused"
        rb.RESBLOCK_IMPL = "v2"
        rb.CONV9_IMPL = "scatter"
        rb.MM_DTYPE = jnp.float32
        rb.supported = lambda shape, cout: (
            shape[-1] % 128 == 0 and cout % 128 == 0
        )
        ab.supported = lambda shape: (
            shape[-1] % 128 == 0 and (shape[1] * shape[2]) % 8 == 0
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(eps(v, u, t))
    finally:
        layers.CONV3X3_IMPL = old_impl
        rb.supported, ab.supported, rb.MM_DTYPE = old_rb, old_ab, old_mm
        rb.RESBLOCK_IMPL, rb.CONV9_IMPL = old_v, old_c9
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel
