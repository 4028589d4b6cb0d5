"""Fused ops: numerics vs XLA references (Pallas kernels run in interpreter
mode on CPU; the compiled path is exercised on real TPU by bench.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gddim_tpu.ops.attention import attention_einsum5d, attention_xla, self_attention_2d
from gddim_tpu.ops.groupnorm import group_norm_silu, group_norm_silu_reference


def test_attention_xla_matches_einsum5d(rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        for _ in range(3)
    )
    a = np.asarray(self_attention_2d(q, k, v, impl="xla"))
    b = np.asarray(attention_einsum5d(q, k, v))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_attention_softmax_rows_sum():
    """Attention of constant v returns v (softmax rows sum to 1)."""
    q = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 32)), jnp.float32)
    k = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 32)), jnp.float32)
    v = jnp.ones((1, 16, 32), jnp.float32) * 3.5
    out = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_flash_attention_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.flash import flash_attention

    q, k, v = (
        jnp.asarray(rng.normal(size=(3, 256, 128)).astype(np.float32))
        for _ in range(3)
    )
    ref = np.asarray(attention_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_group_norm_silu_reference_matches_flax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    gn = nn.GroupNorm(num_groups=16, epsilon=1e-6)
    expected = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = group_norm_silu_reference(x, scale, bias, 16, apply_silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)
    # fused silu == norm then swish
    got_silu = group_norm_silu_reference(x, scale, bias, 16, apply_silu=True)
    np.testing.assert_allclose(
        np.asarray(got_silu), np.asarray(nn.swish(expected)), rtol=1e-5, atol=1e-5
    )


def test_group_norm_silu_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.groupnorm import _gn_silu_pallas

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = group_norm_silu_reference(x, scale, bias, 32)
    with pltpu.force_tpu_interpret_mode():
        got = _gn_silu_pallas(x, scale, bias, 32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_group_norm_silu_gradient():
    """custom_vjp backward equals autodiff of the reference."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)

    def f_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, 8) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(group_norm_silu_reference(x, s, b, 8) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_model_groupnorm_params_match_flax_layout():
    """The custom GroupNorm module creates the same param names/shapes as
    nn.GroupNorm (legacy checkpoint compatibility)."""
    from gddim_tpu.models.layers import GroupNorm

    x = jnp.ones((1, 4, 4, 32))
    params = GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"scale", "bias"}
    assert params["scale"].shape == (32,)
    ref_params = nn.GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)["params"]
    assert set(ref_params.keys()) == set(params.keys())


def test_flash_attention_blocked_long_sequence(rng):
    """S=2048 exercises the blocked online-softmax path; must match XLA."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.flash import flash_attention

    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2048, 128)).astype(np.float32))
        for _ in range(3)
    )
    ref = np.asarray(attention_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, block_q=512, block_k=512))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def test_attention_pallas_gradient_matches_xla(rng):
    """attention_pallas must be differentiable (training path) with gradients
    equal to the XLA attention's."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.attention import attention_pallas

    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 256, 128)).astype(np.float32))
        for _ in range(3)
    )

    def f_pallas(q, k, v):
        return jnp.sum(attention_pallas(q, k, v) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_conv3x3_pallas_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_xla, supported

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32) * 0.05)
    ref = np.asarray(conv3x3_xla(x, w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(conv3x3_pallas(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # gradient falls back to XLA and matches
    def f_p(x, w):
        return jnp.sum(conv3x3_pallas(x, w) ** 2)

    def f_x(x, w):
        return jnp.sum(conv3x3_xla(x, w) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_p, argnums=(0, 1))(x, w)
    g2 = jax.grad(f_x, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
    # dispatch predicate
    assert not supported((2, 8, 8, 6), (3, 3, 6, 128), 1, 1)  # cin not 128-mult
    assert not supported((2, 8, 8, 128), (3, 3, 128, 128), 2, 1)  # strided


def test_conv3x3_int8_quantized_numerics(rng):
    """int8 conv (per-tensor act scale, per-channel weight scales, fused
    dequant+bias epilogue) tracks the f32 conv within quantization error."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.conv3x3 import (
        conv3x3_pallas_int8,
        conv3x3_xla,
        quantize_per_tensor,
        quantize_weight_per_channel,
    )

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    w = rng.normal(size=(3, 3, 128, 128)).astype(np.float32) * 0.05
    bias = rng.normal(size=(128,)).astype(np.float32)
    ref = np.asarray(conv3x3_xla(x, jnp.asarray(w))) + bias

    x8, sx = quantize_per_tensor(x)
    w8, sw = quantize_weight_per_channel(w)
    assert x8.dtype == jnp.int8 and w8.dtype == np.int8
    # quantization round-trips within 1 LSB
    np.testing.assert_allclose(
        np.asarray(x8, np.float32) * float(sx), np.asarray(x), atol=float(sx)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            conv3x3_pallas_int8(
                x8, jnp.asarray(w8), jnp.asarray(sw), sx, bias=bias,
                out_dtype=jnp.float32,
            )
        )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel  # int8 quantization error budget
    # per-sample activation scales: at least as accurate as per-tensor
    from gddim_tpu.ops.conv3x3 import quantize_per_sample

    x_scaled = x * jnp.linspace(0.1, 4.0, x.shape[0]).reshape(-1, 1, 1, 1)
    ref_s = np.asarray(conv3x3_xla(x_scaled, jnp.asarray(w))) + bias
    xs8, sxs = quantize_per_sample(x_scaled)
    assert sxs.shape == (x.shape[0],)
    with pltpu.force_tpu_interpret_mode():
        got_s = np.asarray(
            conv3x3_pallas_int8(
                xs8, jnp.asarray(w8), jnp.asarray(sw), sxs, bias=bias,
                out_dtype=jnp.float32,
            )
        )
    rel_s = np.abs(got_s - ref_s).max() / np.abs(ref_s).max()
    assert rel_s < 0.03, rel_s


def test_conv_module_int8_impl(rng):
    """The Conv module's conv_impl='int8' path: same params tree as the
    f32 path, output within the quantization budget."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    conv = layers.Conv(128, kernel_size=(3, 3), allow_quantized=True)
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(params, x))
    old = layers.CONV3X3_IMPL
    try:
        layers.CONV3X3_IMPL = "int8"
        # same params usable in both paths (checkpoint compatibility)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(conv.apply(params, x))
    finally:
        layers.CONV3X3_IMPL = old
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_group_norm_silu_quant_kernel(rng):
    """Fused GN+SiLU+int8-quantize: dequantized output matches the unfused
    reference within quantization error; scales are per-sample."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.groupnorm import (
        _gn_silu_quant_pallas,
        group_norm_silu_quant,
        group_norm_silu_reference,
    )

    x = jnp.asarray(rng.normal(size=(3, 8, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = np.asarray(group_norm_silu_reference(x, scale, bias, 32))
    with pltpu.force_tpu_interpret_mode():
        q, s = _gn_silu_quant_pallas(x, scale, bias, 32, 1e-6, True)
    assert q.dtype == jnp.int8 and s.shape == (3,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None, None, None]
    assert np.abs(deq - ref).max() <= np.asarray(s).max() * 1.01  # 1 LSB
    # CPU fallback path produces equivalent numbers
    q2, s2 = group_norm_silu_quant(x, scale, bias, 32)
    deq2 = np.asarray(q2, np.float32) * np.asarray(s2)[:, None, None, None]
    np.testing.assert_allclose(deq, deq2, atol=float(np.asarray(s).max()) * 1.01)


def test_resblock_int8_fusion_matches_unfused(rng):
    """A BigGAN resblock under conv_impl='int8' (fused GN->quant->conv) stays
    within the quantization budget of the f32 block, with identical params."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp

    block = ResnetBlockBigGANpp(act=nn.swish, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    params = block.init(
        {"params": jax.random.PRNGKey(0)}, x, temb, train=False
    )
    ref = np.asarray(block.apply(params, x, temb, train=False))
    old = layers.CONV3X3_IMPL
    try:
        layers.CONV3X3_IMPL = "int8"
        # int8 path requires a "tpu" backend answer from supported(); fusion
        # predicate checks shapes only after the impl flag, so patch the
        # backend check through interpret mode + monkeypatched supported.
        from gddim_tpu.ops import conv3x3 as c3

        orig_supported = c3.supported

        def fake_supported(x_shape, w_shape, stride, dilation):
            return (
                stride == 1 and dilation == 1
                and x_shape[-1] % 128 == 0 and w_shape[-1] % 128 == 0
                and w_shape[:2] == (3, 3)
            )

        c3.supported = fake_supported
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(block.apply(params, x, temb, train=False))
    finally:
        layers.CONV3X3_IMPL = old
        c3.supported = orig_supported
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_fused_resblock_matches_reference(rng):
    """The whole-residual-block kernel == the unfused composition, for both
    identity and conv1x1-projected skips."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import fused_resblock, resblock_reference

    B, H, C = 2, 8, 128
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)

    ref = np.asarray(
        resblock_reference(x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, **kw)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_resblock(
                x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
                mm_dtype=jnp.float32, **kw,
            )
        )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

    # projected skip (C -> 2C) with bias
    C2 = 256
    w1p = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    w2p = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    tembp = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    b1p = jnp.zeros((C2,), jnp.float32)
    b2p = jnp.zeros((C2,), jnp.float32)
    g2sp = jnp.ones((C2,), jnp.float32)
    g2bp = jnp.zeros((C2,), jnp.float32)
    ref2 = np.asarray(
        resblock_reference(
            x, tembp, g1s, g1b, w1p, b1p, g2sp, g2bp, w2p, b2p, ws, bs, **kw
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got2 = np.asarray(
            fused_resblock(
                x, tembp, g1s, g1b, w1p, b1p, g2sp, g2bp, w2p, b2p, ws, bs,
                mm_dtype=jnp.float32, **kw,
            )
        )
    np.testing.assert_allclose(got2, ref2, rtol=5e-4, atol=5e-4)


def test_fused_resblock_tail_matches_reference(rng):
    """The transition-block tail kernel (conv1+temb+GN2+SiLU+conv2+conv1x1
    skip) == the unfused composition, f32 exact and int8 within budget."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import fused_resblock_tail, resblock_tail_reference

    B, H, C, C2 = 2, 8, 128, 256
    h = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    kw = dict(num_groups2=32, skip_rescale=True)
    args = (h, xs, temb, w1, b1, g2s, g2b, w2, b2, ws, bs)
    ref = np.asarray(resblock_tail_reference(*args, **kw))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_resblock_tail(*args, mm_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(fused_resblock_tail(*args, mm_dtype=jnp.int8, **kw))
    rel = np.abs(got8 - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_fused_resblock_transition_matches_reference(rng):
    """The whole-transition kernel (GN1+SiLU + in-kernel polyphase FIR/naive
    resample of both paths + conv1+temb+GN2+SiLU+conv2+conv1x1 skip) == the
    unfused composition, for up/down x fir/naive, f32 exact and int8 within
    budget."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import (
        fused_resblock_transition,
        resblock_transition_reference,
    )

    B, H, C, C2 = 2, 8, 128, 128
    temb = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    for up in (False, True):
        for fir in (True, False):
            x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
            kw = dict(
                up=up, fir=fir, num_groups1=32, num_groups2=32,
                skip_rescale=True,
            )
            args = (x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs)
            ref = np.asarray(resblock_transition_reference(*args, **kw))
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    fused_resblock_transition(*args, mm_dtype=jnp.float32, **kw)
                )
            np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
            with pltpu.force_tpu_interpret_mode():
                got8 = np.asarray(
                    fused_resblock_transition(*args, mm_dtype=jnp.int8, **kw)
                )
            rel = np.abs(got8 - ref).max() / np.abs(ref).max()
            assert rel < 0.05, (up, fir, rel)


def test_fused_resblock_transition_static_scales(rng):
    """Static-scale int8 mode of the transition kernel (calibrated a1/a2/x
    inverse scales, amax-free) tracks the f32 oracle within the int8 budget,
    including the hybrid dynamic-skip variant (sx=None)."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import (
        act_scales_from_amax,
        fused_resblock_transition,
        resblock_transition_reference,
    )

    B, H, C, C2 = 2, 8, 128, 128
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    kw = dict(up=True, fir=True, num_groups1=32, num_groups2=32, skip_rescale=True)
    args = (x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs)
    ref = np.asarray(resblock_transition_reference(*args, **kw))
    # generous amaxes (as a calibration sweep would produce)
    a1_amax, a2_amax, x_amax = 4.0, 4.0, float(np.abs(np.asarray(x)).max())
    for sx in (x_amax, None):  # static and hybrid-dynamic skip
        scales = act_scales_from_amax((a1_amax, a2_amax, sx))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                fused_resblock_transition(
                    *args, mm_dtype=jnp.int8, act_scales=scales, **kw
                )
            )
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.05, (sx, rel)


def test_fused_resblock_train_forward_matches_reference(rng):
    """The fused kernel with an in-kernel dropout mask (training forward)
    == the unfused composition with the same mask (f32 exact)."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import fused_resblock, resblock_train_reference

    B, H, C, C2 = 2, 8, 128, 256
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    keep = 0.9
    mask = (rng.random((B, H, H, C2)) < keep).astype(np.int8)
    args = (x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2)
    ref = np.asarray(resblock_train_reference(
        *args, ws, bs, jnp.asarray(mask), keep_prob=keep, has_skip=True,
        num_groups1=32, num_groups2=32,
    ))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_resblock(
            *args, ws, bs, num_groups1=32, num_groups2=32,
            mm_dtype=jnp.float32, drop_mask=jnp.asarray(mask), keep_prob=keep,
        ))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_fused_resblock_train_gradients_match_unfused(rng):
    """make_fused_resblock_train's custom_vjp backward == plain autodiff of
    the unfused composition, for every differentiable input (same mask).

    Runs on CPU, where the wrapper's forward falls back to the reference —
    which makes the check exact: the custom backward must reproduce the
    autodiff gradients bit-for-bit up to float noise."""
    from gddim_tpu.ops.resblock import (
        make_fused_resblock_train,
        resblock_train_reference,
    )

    B, H, C = 2, 8, 128
    keep = 0.9
    arrs = dict(
        x=rng.normal(size=(B, H, H, C)) * 0.5,
        temb=rng.normal(size=(B, C)),
        g1s=1 + 0.1 * rng.normal(size=(C,)),
        g1b=0.1 * rng.normal(size=(C,)),
        w1=rng.normal(size=(3, 3, C, C)) * 0.05,
        b1=0.1 * rng.normal(size=(C,)),
        g2s=1 + 0.1 * rng.normal(size=(C,)),
        g2b=0.1 * rng.normal(size=(C,)),
        w2=rng.normal(size=(3, 3, C, C)) * 0.05,
        b2=0.1 * rng.normal(size=(C,)),
    )
    arrs = {k: jnp.asarray(v, jnp.float32) for k, v in arrs.items()}
    wsp = jnp.zeros((1, 1), jnp.float32)
    bsp = jnp.zeros((1,), jnp.float32)
    mask = jnp.asarray((rng.random((B, H, H, C)) < keep).astype(np.int8))
    f = make_fused_resblock_train(
        num_groups1=32, num_groups2=32, keep_prob=keep, has_skip=False,
    )
    names = list(arrs)
    vals = [arrs[k] for k in names]

    def loss_fused(*a):
        return jnp.sum(f(*a, wsp, bsp, mask) ** 2)

    def loss_ref(*a):
        return jnp.sum(
            resblock_train_reference(
                *a, wsp, bsp, mask, keep_prob=keep, has_skip=False,
                num_groups1=32, num_groups2=32,
            ) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(vals))))(*vals)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(vals))))(*vals)
    for name, gf, gr in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_biggan_block_fused_train_matches_normal(rng):
    """ResnetBlockBigGANpp in TRAIN mode dispatching to the fused-train
    kernel (interpret mode) matches the composable-module train path on
    identical params — values AND parameter gradients (dropout=0 so the two
    paths share the exact function)."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    block = ResnetBlockBigGANpp(act=nn.swish, dropout=0.0, out_ch=256)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=True)

    def loss(p, fused):
        old_ft, old_sup, old_mm = layers.FUSED_TRAIN, rb.supported, rb.MM_DTYPE
        try:
            layers.FUSED_TRAIN = fused
            rb.MM_DTYPE = jnp.float32
            rb.supported = lambda shape, cout: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            out = block.apply(
                p, x, temb, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
        finally:
            layers.FUSED_TRAIN, rb.supported, rb.MM_DTYPE = old_ft, old_sup, old_mm
        return jnp.sum(out**2), out

    with pltpu.force_tpu_interpret_mode():
        (l_f, out_f), g_f = jax.value_and_grad(loss, has_aux=True)(params, True)
    (l_r, out_r), g_r = jax.value_and_grad(loss, has_aux=True)(params, False)
    rel = np.abs(np.asarray(out_f) - np.asarray(out_r)).max() / np.abs(
        np.asarray(out_r)
    ).max()
    assert rel < 2e-3, rel
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = jax.tree.leaves(g_r)
    assert len(flat_f) == len(flat_r)
    for (path, gf), gr in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_biggan_updown_block_fused_transition_matches_normal(rng):
    """ResnetBlockBigGANpp with up/down dispatching to the whole-transition
    kernel matches the composable-module path on identical params."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    for up, down, fir in [(True, False, True), (False, True, True), (False, True, False)]:
        block = ResnetBlockBigGANpp(
            act=nn.swish, dropout=0.0, up=up, down=down, fir=fir
        )
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
        params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
        ref = np.asarray(block.apply(params, x, temb, train=False))
        old_impl, old_tsup, old_mm = (
            layers.CONV3X3_IMPL, rb.transition_supported, rb.MM_DTYPE
        )
        try:
            layers.CONV3X3_IMPL = "fused"
            rb.MM_DTYPE = jnp.float32
            rb.transition_supported = lambda shape, cout, up, fir, fk: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(block.apply(params, x, temb, train=False))
        finally:
            layers.CONV3X3_IMPL, rb.transition_supported, rb.MM_DTYPE = (
                old_impl, old_tsup, old_mm
            )
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-3, (up, down, fir, rel)


def test_biggan_updown_block_fused_tail_matches_normal(rng):
    """ResnetBlockBigGANpp with up/down under conv_impl='fused' (the fused
    tail path) matches the composable-module path on identical params."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    for up, down, fir in [(True, False, True), (False, True, True), (False, True, False)]:
        block = ResnetBlockBigGANpp(
            act=nn.swish, dropout=0.0, up=up, down=down, fir=fir
        )
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
        params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
        ref = np.asarray(block.apply(params, x, temb, train=False))
        old_impl, old_sup, old_mm = layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE
        try:
            layers.CONV3X3_IMPL = "fused"
            rb.MM_DTYPE = jnp.float32
            rb.supported = lambda shape, cout: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(block.apply(params, x, temb, train=False))
        finally:
            layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE = old_impl, old_sup, old_mm
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-3, (up, down, fir, rel)


def test_biggan_block_fused_impl_matches_normal(rng):
    """ResnetBlockBigGANpp under conv_impl='fused' (whole-block Pallas
    kernel) matches the composable-module path on identical params, for both
    identity and projected (Conv_2) skips."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    for out_ch in (None, 256):
        block = ResnetBlockBigGANpp(act=nn.swish, dropout=0.0, out_ch=out_ch)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
        params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
        ref = np.asarray(block.apply(params, x, temb, train=False))
        old_impl, old_sup, old_mm = layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE
        try:
            layers.CONV3X3_IMPL = "fused"
            rb.MM_DTYPE = jnp.float32
            rb.supported = lambda shape, cout: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(block.apply(params, x, temb, train=False))
        finally:
            layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE = old_impl, old_sup, old_mm
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-3, (out_ch, rel)


def test_fused_resblock_int8_mode(rng):
    """mm_dtype=int8 in the fused block: in-kernel per-sample quantization,
    output within the compounded quantization budget of the f32 oracle."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import fused_resblock, resblock_reference

    B, H, C = 2, 8, 128
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    ones = jnp.ones((C,), jnp.float32)
    zeros = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)
    ref = np.asarray(
        resblock_reference(x, temb, ones, zeros, w1, zeros, ones, zeros, w2, zeros, **kw)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_resblock(
                x, temb, ones, zeros, w1, zeros, ones, zeros, w2, zeros,
                mm_dtype=jnp.int8, **kw,
            )
        )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_fused_attnblock_matches_reference(rng):
    """Whole attention block in one kernel == the unfused composition."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.attnblock import attnblock_reference, fused_attnblock

    B, H, C = 2, 16, 128  # S = 256 tokens
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    gs = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    gb = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    mats = [
        jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    rows = [jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32)) for _ in range(4)]
    args = [x, gs, gb]
    for m, r in zip(mats, rows):
        args += [m, r]
    kw = dict(num_groups=32, skip_rescale=True)
    ref = np.asarray(attnblock_reference(*args, **kw))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attnblock(*args, mm_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    # int8 NIN projections: per-sample in-kernel activation quantization,
    # output within the compounded quantization budget of the f32 oracle
    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(fused_attnblock(*args, mm_dtype=jnp.int8, **kw))
    rel = np.abs(got8 - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_attnblock_module_fused_impl_matches_normal(rng):
    """AttnBlockpp under conv_impl='fused' matches the composable path."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import AttnBlockpp
    from gddim_tpu.ops import attnblock as ab

    block = AttnBlockpp(skip_rescale=True)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    params = block.init({"params": jax.random.PRNGKey(0)}, x)
    ref = np.asarray(block.apply(params, x, train=False))
    old_impl, old_sup = layers.CONV3X3_IMPL, ab.supported
    try:
        layers.CONV3X3_IMPL = "fused"
        ab.supported = lambda shape: shape[-1] % 128 == 0
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(block.apply(params, x, train=False))
    finally:
        layers.CONV3X3_IMPL, ab.supported = old_impl, old_sup
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel


def test_ddpm_block_fused_impl_matches_normal(rng):
    """ResnetBlockDDPMpp under conv_impl='fused' (NIN skip variant)."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockDDPMpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    for out_ch in (None, 256):
        block = ResnetBlockDDPMpp(act=nn.swish, dropout=0.0, out_ch=out_ch)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
        params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
        ref = np.asarray(block.apply(params, x, temb, train=False))
        old_impl, old_sup, old_mm = layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE
        try:
            layers.CONV3X3_IMPL = "fused"
            rb.MM_DTYPE = jnp.float32
            rb.supported = lambda shape, cout: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(block.apply(params, x, temb, train=False))
        finally:
            layers.CONV3X3_IMPL, rb.supported, rb.MM_DTYPE = old_impl, old_sup, old_mm
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-3, (out_ch, rel)


def test_conv_int8_training_safe_fallback(rng):
    """Without allow_quantized, conv_impl='int8' falls back to the XLA conv:
    gradients flow (int8 rounding would silently zero them)."""
    from gddim_tpu.models import layers

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    conv = layers.Conv(128, kernel_size=(3, 3))  # allow_quantized=False
    params = conv.init(jax.random.PRNGKey(0), x)
    old = layers.CONV3X3_IMPL
    try:
        layers.CONV3X3_IMPL = "int8"
        g = jax.grad(lambda p, xx: jnp.sum(conv.apply(p, xx) ** 2))(params, x)
    finally:
        layers.CONV3X3_IMPL = old
    gn = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(g))
    )
    assert gn > 0.0


def test_static_scale_calibration_attnblock(rng):
    """Calibration pass sows qscales; the fused int8 static-scale path then
    matches the unfused reference within the int8 budget."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import AttnBlockpp
    from gddim_tpu.ops import attnblock as ab

    block = AttnBlockpp(skip_rescale=True)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    params = block.init({"params": jax.random.PRNGKey(0)}, x)
    ref = np.asarray(block.apply(params, x, train=False))

    old_impl, old_sup = layers.CONV3X3_IMPL, ab.supported
    try:
        layers.CONV3X3_IMPL = "fused_int8"
        ab.supported = lambda shape: shape[-1] % 128 == 0
        # calibration: mutable qscales gates the fused path off and sows
        out_cal, mut = block.apply(
            params, x, train=False, mutable=["qscales"]
        )
        qs = mut["qscales"]
        flat = jax.tree.leaves(qs)
        assert len(flat) == 2 and all(float(v) > 0 for v in flat)
        np.testing.assert_allclose(np.asarray(out_cal), ref, rtol=2e-5, atol=2e-5)
        # inference with merged qscales -> static-scale int8 kernel
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                block.apply(dict(params, qscales=qs), x, train=False)
            )
    finally:
        layers.CONV3X3_IMPL, ab.supported = old_impl, old_sup
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_static_scale_calibration_biggan_block(rng):
    """BigGAN res-block (plain, projected-skip, and down-transition) under
    calibrated static int8 scales matches the composable path."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    cases = [
        dict(out_ch=None, down=False),
        dict(out_ch=256, down=False),
        dict(out_ch=None, down=True, fir=True),
    ]
    for case in cases:
        block = ResnetBlockBigGANpp(act=nn.swish, dropout=0.0, **case)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
        params = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
        ref = np.asarray(block.apply(params, x, temb, train=False))
        old_impl, old_sup = layers.CONV3X3_IMPL, rb.supported
        try:
            layers.CONV3X3_IMPL = "fused_int8"
            rb.supported = lambda shape, cout: (
                shape[-1] % 128 == 0 and cout % 128 == 0
            )
            out_cal, mut = block.apply(
                params, x, temb, train=False, mutable=["qscales"]
            )
            qs = mut["qscales"]
            np.testing.assert_allclose(
                np.asarray(out_cal), ref, rtol=2e-5, atol=2e-5
            )
            expected_sites = 3 if (case.get("out_ch") or case.get("down")) else 2
            assert len(jax.tree.leaves(qs)) == expected_sites, qs
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    block.apply(dict(params, qscales=qs), x, temb, train=False)
                )
        finally:
            layers.CONV3X3_IMPL, rb.supported = old_impl, old_sup
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.06, (case, rel)


def test_fused_resblock_pair_matches_concat(rng):
    """The two-input (concat-free) up-path kernel == fused_resblock on the
    materialized concat, f32 exact vs the reference, int8 within budget,
    and static-scale int8 within budget."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import (
        act_scales_from_amax, fused_resblock_pair, resblock_reference,
    )

    B, H, C1, C2, CO = 2, 8, 128, 256, 128
    C = C1 + C2
    xa = jnp.asarray(rng.normal(size=(B, H, H, C1)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(B, H, H, C2)).astype(np.float32))
    x = jnp.concatenate([xa, xb], axis=-1)
    temb = jnp.asarray(rng.normal(size=(B, CO)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, CO)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, CO, CO)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, CO)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)

    ref = np.asarray(
        resblock_reference(x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs, **kw)
    )
    pair_args = (xa, xb, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_resblock_pair(*pair_args, mm_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(fused_resblock_pair(*pair_args, mm_dtype=jnp.int8, **kw))
    rel8 = np.abs(got8 - ref).max() / np.abs(ref).max()
    assert rel8 < 0.05, rel8

    sc = act_scales_from_amax((3.0, 3.0, float(np.abs(np.asarray(x)).max())))
    with pltpu.force_tpu_interpret_mode():
        gots = np.asarray(
            fused_resblock_pair(*pair_args, mm_dtype=jnp.int8, act_scales=sc, **kw)
        )
    rels = np.abs(gots - ref).max() / np.abs(ref).max()
    assert rels < 0.06, rels


def test_biggan_block_pair_input_matches_concat_input(rng):
    """ResnetBlockBigGANpp fed an (h, skip) pair: identical params and output
    to the concatenated input on the normal path, and the fused pair path
    matches within kernel tolerance."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import ResnetBlockBigGANpp
    from gddim_tpu.ops import resblock as rb

    temb = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    block = ResnetBlockBigGANpp(act=nn.swish, dropout=0.0, out_ch=128)
    xa = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    x = jnp.concatenate([xa, xb], axis=-1)
    params_pair = block.init(
        {"params": jax.random.PRNGKey(0)}, (xa, xb), temb, train=False
    )
    params_cat = block.init({"params": jax.random.PRNGKey(0)}, x, temb, train=False)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == b.shape, params_pair, params_cat)
    )
    ref = np.asarray(block.apply(params_cat, x, temb, train=False))
    normal_pair = np.asarray(block.apply(params_cat, (xa, xb), temb, train=False))
    np.testing.assert_allclose(normal_pair, ref, rtol=1e-6, atol=1e-6)

    old_impl, old_sup = layers.CONV3X3_IMPL, rb.supported
    try:
        layers.CONV3X3_IMPL = "fused"
        rb.MM_DTYPE_SAVE = rb.MM_DTYPE
        rb.MM_DTYPE = jnp.float32
        rb.supported = lambda shape, cout: (
            shape[-1] % 128 == 0 and cout % 128 == 0
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(block.apply(params_cat, (xa, xb), temb, train=False))
    finally:
        layers.CONV3X3_IMPL, rb.supported = old_impl, old_sup
        rb.MM_DTYPE = rb.MM_DTYPE_SAVE
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 2e-3, rel


def test_fused_attnblock_small_n_middle_block(rng):
    """The 4x4 middle block (n=16 tokens) is now fused-eligible; the kernel
    must match the reference at this shape too."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.attnblock import attnblock_reference, fused_attnblock

    B, H, C = 2, 4, 256
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    gs = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    gb = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    args = [x, gs, gb]
    for _ in range(4):
        args += [
            jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1),
            jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32)),
        ]
    kw = dict(num_groups=32, skip_rescale=True)
    ref = np.asarray(attnblock_reference(*args, **kw))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attnblock(*args, mm_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(fused_attnblock(*args, mm_dtype=jnp.int8, **kw))
    rel = np.abs(got8 - ref).max() / np.abs(ref).max()
    assert rel < 0.06, rel


def test_fused_resblock_hybrid_static_dynamic_skip(rng):
    """act_scales with sx=None: a1/a2 quantize with calibrated static scales
    while the (input-dependent) skip site stays per-sample dynamic. The
    output must track the reference even when the input amplitude far
    exceeds anything a calibration sweep saw."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops.resblock import (
        act_scales_from_amax, fused_resblock, resblock_reference,
    )

    B, H, C, CO = 2, 8, 256, 128
    # 5x the "calibrated" input range: a static x scale would clip hard
    x = 5.0 * jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, CO)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, CO)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, CO, CO)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, CO)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)
    args = (x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs)

    ref = np.asarray(resblock_reference(*args, **kw))
    sc = act_scales_from_amax((3.0, 3.0, None))
    assert sc[2] is None
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_resblock(*args, mm_dtype=jnp.int8, act_scales=sc, **kw)
        )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.06, rel


def test_fused_resblock_v2_loop_free_matches_reference(rng):
    """The loop-free kernel body (RESBLOCK_IMPL='v2': tile-vectorized GN /
    quant / epilogues) must match the reference in every mode it serves:
    f32, identity + projected skip, static-int8 with dynamic bf16 skip, and
    the transition tail."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops import resblock as rb

    B, H, C, C2 = 2, 8, 128, 256
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)

    old = rb.RESBLOCK_IMPL
    rb.RESBLOCK_IMPL = "v2"
    try:
        # f32, identity skip
        ref = np.asarray(
            rb.resblock_reference(x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, **kw)
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                rb.fused_resblock(
                    x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
                    mm_dtype=jnp.float32, **kw,
                )
            )
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

        # projected skip + static-int8 a1/a2 with dynamic bf16 skip (the
        # production hybrid) and fully-static skip
        w1p = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
        w2p = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
        ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
        bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
        tembp = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
        zp = jnp.zeros((C2,), jnp.float32)
        op = jnp.ones((C2,), jnp.float32)
        args = (x, tembp, g1s, g1b, w1p, zp, op, zp, w2p, zp, ws, bs)
        ref2 = np.asarray(rb.resblock_reference(*args, **kw))
        amax1 = float(np.abs(np.asarray(
            group_norm_silu_reference(x, g1s, g1b, 32)
        )).max())
        for sx in (None, float(np.abs(np.asarray(x)).max())):
            sc = rb.act_scales_from_amax((amax1, 6.0, sx))
            with pltpu.force_tpu_interpret_mode():
                got2 = np.asarray(
                    rb.fused_resblock(
                        *args, mm_dtype=jnp.int8, act_scales=sc, **kw
                    )
                )
            rel = np.abs(got2 - ref2).max() / np.abs(ref2).max()
            assert rel < 0.06, (sx, rel)

        # transition tail (apply_gn1=False, separate skip), f32
        hpre = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
        xsk = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
        wsq = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
        ref3 = np.asarray(
            rb.resblock_tail_reference(
                hpre, xsk, tembp, w1p, zp, op, zp, w2p, zp, wsq, bs,
                num_groups2=32, skip_rescale=True,
            )
        )
        with pltpu.force_tpu_interpret_mode():
            got3 = np.asarray(
                rb.fused_resblock_tail(
                    hpre, xsk, tembp, w1p, zp, op, zp, w2p, zp, wsq, bs,
                    num_groups2=32, skip_rescale=True, mm_dtype=jnp.float32,
                )
            )
        np.testing.assert_allclose(got3, ref3, rtol=5e-4, atol=5e-4)
    finally:
        rb.RESBLOCK_IMPL = old


def test_fused_resblock_pair_v2_matches_reference(rng):
    """Loop-free pair kernel (v2) == reference on the concatenated input,
    f32 and static-int8 (hybrid dynamic skip)."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops import resblock as rb

    B, H, C1, C2, CO = 2, 8, 128, 128, 128
    xa = jnp.asarray(rng.normal(size=(B, H, H, C1)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(B, H, H, C2)).astype(np.float32))
    x = jnp.concatenate([xa, xb], axis=-1)
    cin = C1 + C2
    temb = jnp.asarray(rng.normal(size=(B, CO)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(cin,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(cin,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, CO)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(CO,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, CO, CO)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(cin, CO)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(CO,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)

    ref = np.asarray(
        rb.resblock_reference(
            x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs, **kw
        )
    )
    old = rb.RESBLOCK_IMPL
    rb.RESBLOCK_IMPL = "v2"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                rb.fused_resblock_pair(
                    xa, xb, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs,
                    mm_dtype=jnp.float32, **kw,
                )
            )
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

        amax1 = float(np.abs(np.asarray(
            group_norm_silu_reference(x, g1s, g1b, 32)
        )).max())
        sc = rb.act_scales_from_amax((amax1, 6.0, None))
        with pltpu.force_tpu_interpret_mode():
            got8 = np.asarray(
                rb.fused_resblock_pair(
                    xa, xb, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs,
                    mm_dtype=jnp.int8, act_scales=sc, **kw,
                )
            )
        rel = np.abs(got8 - ref).max() / np.abs(ref).max()
        assert rel < 0.06, rel
    finally:
        rb.RESBLOCK_IMPL = old


def test_pick_bt_overrides_respect_vmem_hard_limit(monkeypatch):
    """GDDIM_RESBLOCK_BT_MAP must apply only where the tile fits Mosaic's
    16 MB scoped-vmem hard limit (a pair tile at bt=4/32x32 measures ~17 MB
    and is rejected at compile on hardware — the guard keeps a map entry
    tuned on singles from taking down wider-cin kernels)."""
    from gddim_tpu.ops.resblock import _pick_bt

    monkeypatch.setenv("GDDIM_RESBLOCK_BT_MAP", "1024:4")
    # single 32x32 c=128 (v2 budget): fits -> takes the override
    assert _pick_bt(64, 32, 32, 128, 128, max_bt=64, work_tiles=3) == 4
    # pair 32x32 cin=256/384: would blow the hard limit -> falls back
    assert _pick_bt(64, 32, 32, 256, 128) != 4
    assert _pick_bt(64, 32, 32, 384, 128) != 4
    # other shapes unaffected by the 1024-keyed entry
    assert _pick_bt(64, 16, 16, 256, 256) == _pick_bt_nomap(64, 16, 16, 256, 256)


def _pick_bt_nomap(*args, **kw):
    import os

    from gddim_tpu.ops.resblock import _pick_bt

    old = os.environ.pop("GDDIM_RESBLOCK_BT_MAP", None)
    try:
        return _pick_bt(*args, **kw)
    finally:
        if old is not None:
            os.environ["GDDIM_RESBLOCK_BT_MAP"] = old


def test_fused_veto_env_disables_supported(monkeypatch):
    """GDDIM_FUSED_VETO_N routes a level to the unfused XLA path."""
    from gddim_tpu.ops import resblock as rb

    monkeypatch.setenv("GDDIM_FUSED_VETO_N", "1024")
    assert not rb.supported((64, 32, 32, 128), 128)
    monkeypatch.delenv("GDDIM_FUSED_VETO_N")
    # baseline gate logic unchanged without the env (backend-dependent on
    # CPU it is False for other reasons; just ensure no exception)
    rb.supported((64, 32, 32, 128), 128)


def test_fused_resblock_scatter_matches_gather(rng, monkeypatch):
    """The scatter-form in-kernel conv (_conv9_scatter: contiguous wide-N
    matmuls + shifted VPU adds, round-4 MXU-relayout lever) must produce the
    same block outputs as the production gather form, for every v2 kernel
    family (single / pair / tail), int8-static and bf16, at both tap
    groupings. int8 accumulates exactly in int32, so the int8 paths must be
    bit-equal; bf16/f32 differ only by add order."""
    from jax.experimental.pallas import tpu as pltpu

    import gddim_tpu.ops.resblock as R

    B, H, C, C2 = 4, 8, 128, 256
    x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32))
    g1s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    g1b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C2)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2s = jnp.asarray(1 + 0.1 * rng.normal(size=(C2,)).astype(np.float32))
    g2b = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.1)
    bs = jnp.asarray(0.1 * rng.normal(size=(C2,)).astype(np.float32))
    kw = dict(num_groups1=32, num_groups2=32, skip_rescale=True)
    sc = (0.07, 0.06, 0.08)  # static act scales incl. static skip

    xb = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    wsp = jnp.asarray(rng.normal(size=(2 * C, C2)).astype(np.float32) * 0.1)
    w1p = jnp.asarray(
        rng.normal(size=(3, 3, 2 * C, C2)).astype(np.float32) * 0.05
    )
    hh = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
    xsk = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))

    def run_all(mm, scales):
        extra = {} if scales is None else {"act_scales": scales}
        with pltpu.force_tpu_interpret_mode():
            single = np.asarray(
                R.fused_resblock(
                    x, temb, g1s, g1b, w1, b1, g2s, g2b, w2, b2, ws, bs,
                    mm_dtype=mm, **extra, **kw,
                )
            )
            pair = np.asarray(
                R.fused_resblock_pair(
                    x, xb, temb, jnp.concatenate([g1s, g1s]),
                    jnp.concatenate([g1b, g1b]), w1p, b1, g2s, g2b, w2, b2,
                    wsp, bs, mm_dtype=mm, **extra, **kw,
                )
            )
            tail = np.asarray(
                R.fused_resblock_tail(
                    hh, xsk, temb, w1, b1, g2s, g2b, w2, b2, ws, bs,
                    num_groups2=32, skip_rescale=True, mm_dtype=mm, **extra,
                )
            )
        return single, pair, tail

    monkeypatch.setattr(R, "RESBLOCK_IMPL", "v2")
    for mm, scales, tol in [
        (jnp.int8, sc, 0.0),
        (jnp.bfloat16, None, 3e-3),
    ]:
        monkeypatch.setattr(R, "CONV9_IMPL", "gather")
        base = run_all(mm, scales)
        for group in (9, 3, 1):
            monkeypatch.setattr(R, "CONV9_IMPL", "scatter")
            monkeypatch.setattr(R, "CONV9_GROUP", group)
            got = run_all(mm, scales)
            for name, a, b in zip(("single", "pair", "tail"), got, base):
                if tol == 0.0:
                    np.testing.assert_array_equal(
                        a, b, err_msg=f"{name} g={group} {mm}"
                    )
                else:
                    np.testing.assert_allclose(
                        a, b, rtol=tol, atol=tol,
                        err_msg=f"{name} g={group} {mm}",
                    )


def test_shape_map_cin_qualified_keys(monkeypatch):
    """Round-5 per-shape override maps: n.cin-qualified keys beat plain n
    keys, and each lookup surface (tap group, kernel body, batch tile)
    resolves them independently (singles and pairs at one resolution have
    different optima — exp_floor_scatter.py / exp_block_ab_r5.py)."""
    import gddim_tpu.ops.resblock as R

    monkeypatch.setenv("GDDIM_X_TEST_MAP", "1024:4,1024.256:2,64.512:1")
    parsed = R._parse_shape_map("GDDIM_X_TEST_MAP")
    assert parsed == {(1024, None): 4, (1024, 256): 2, (64, 512): 1}

    # group lookup: qualified beats plain, plain beats global
    monkeypatch.setattr(R, "CONV9_GROUP_MAP",
                        {(1024, None): 9, (1024, 256): 1})
    assert R._conv9_group_for(1024, 256) == 1
    assert R._conv9_group_for(1024, 128) == 9
    assert R._conv9_group_for(256, 256) == R.CONV9_GROUP

    # impl lookup: 1 -> v1, 2 -> v2, absent -> module default
    monkeypatch.setattr(R, "RESBLOCK_IMPL_MAP", {(64, 512): 1, (16, None): 2})
    assert R._impl_for(64, 512) == "v1"
    assert R._impl_for(16, 512) == "v2"
    assert R._impl_for(1024, 128) == R.RESBLOCK_IMPL

    # bt lookup: cin-qualified entry only hits its own width
    monkeypatch.setenv("GDDIM_RESBLOCK_BT_MAP", "64.256:16")
    assert R._pick_bt(64, 8, 8, 256, 256, max_bt=64, work_tiles=3,
                      scatter=True) == 16
    # the (64, 256)-qualified entry must not hit the cin=512 pair shape
    assert R._pick_bt(64, 8, 8, 512, 256, max_bt=64, work_tiles=3,
                      scatter=True) != 16
    monkeypatch.delenv("GDDIM_RESBLOCK_BT_MAP")


def test_round5_default_policy_baked_in(monkeypatch):
    """The round-5 battery winner ships as in-code defaults (no env needed):
    bt 16 at 8x8 singles, 32 at 4x4 pairs, 2 at 32x32 pairs (scatter form
    only), g=9 at both 4x4 widths; value 0 in the env map drops a default."""
    import gddim_tpu.ops.resblock as R

    monkeypatch.delenv("GDDIM_RESBLOCK_BT_MAP", raising=False)
    assert R._pick_bt(64, 8, 8, 256, 256, max_bt=64, work_tiles=3,
                      scatter=True) == 16
    assert R._pick_bt(64, 4, 4, 512, 256, max_bt=64, work_tiles=3,
                      scatter=True) == 32
    assert R._pick_bt(64, 32, 32, 256, 128, max_bt=64, work_tiles=3,
                      scatter=True) == 2
    # gather form keeps the budget pick (defaults tuned under scatter only):
    # the (1024, 256) default bt=2 must not leak into the gather path
    assert R._pick_bt(64, 32, 32, 256, 128, max_bt=64, work_tiles=3,
                      scatter=False) == 1
    # env value 0 drops the default entry for that shape
    monkeypatch.setenv("GDDIM_RESBLOCK_BT_MAP", "64.256:0")
    assert R._pick_bt(64, 8, 8, 256, 256, max_bt=64, work_tiles=3,
                      scatter=True) != 16
    assert R._conv9_group_for(16, 256) == 9
    assert R._conv9_group_for(16, 512) == 9


@pytest.mark.parametrize(
    "cin,cout,has_skip,dropout,rescale",
    [
        (128, 128, False, 0.1, True),
        (256, 128, True, 0.1, True),
        (128, 256, True, 0.0, True),
        (128, 128, True, 0.3, False),
    ],
)
def test_fused_resblock_bwd_kernel_matches_vjp(
    rng, cin, cout, has_skip, dropout, rescale
):
    """The fused Pallas backward kernel (ops/resblock_bwd.py) reproduces
    jax.vjp of resblock_train_reference for all 12 gradients — f32 matmuls
    in interpret mode make the comparison near-exact."""
    from jax.experimental.pallas import tpu as pltpu

    from gddim_tpu.ops import resblock_bwd as rbw
    from gddim_tpu.ops.resblock import resblock_train_reference

    B, H = 2, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    x = f(B, H, H, cin)
    temb = f(B, cout)
    gn1s, gn1b = f(cin) + 1.0, f(cin) * 0.1
    w1, b1 = f(3, 3, cin, cout) * 0.05, f(cout) * 0.1
    gn2s, gn2b = f(cout) + 1.0, f(cout) * 0.1
    w2, b2 = f(3, 3, cout, cout) * 0.05, f(cout) * 0.1
    wsk = f(cin, cout) * 0.1 if has_skip else jnp.zeros((1, 1))
    bsk = f(cout) * 0.1 if has_skip else jnp.zeros((1,))
    keep = 1.0 - dropout
    mask = jnp.asarray(
        (rng.random((B, H, H, cout)) < keep).astype(np.int8)
    )
    g = f(B, H, H, cout)
    ng1, ng2 = min(cin // 4, 32), min(cout // 4, 32)
    _, vjp = jax.vjp(
        lambda *a: resblock_train_reference(
            *a, mask, keep_prob=keep, has_skip=has_skip, num_groups1=ng1,
            num_groups2=ng2, skip_rescale=rescale,
        ),
        x, temb, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2, wsk, bsk,
    )
    ref = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = rbw.fused_resblock_train_grads(
            x, temb, gn1s, gn1b, w1, b1, gn2s, gn2b, w2, b2, wsk, bsk,
            mask, g, num_groups1=ng1, num_groups2=ng2, skip_rescale=rescale,
            keep_prob=keep, has_skip=has_skip, mm_dtype=jnp.float32,
        )
    names = [
        "dx", "dtemb", "dgn1s", "dgn1b", "dw1", "db1", "dgn2s", "dgn2b",
        "dw2", "db2", "dwsk", "dbsk",
    ]
    for nm, r, gt in zip(names, ref, got):
        if nm in ("dwsk", "dbsk") and not has_skip:
            continue
        r, gt = np.asarray(r), np.asarray(gt)
        err = np.abs(r - gt).max() / (np.abs(r).max() + 1e-12)
        assert err < 2e-5, (nm, err)


def test_fused_resblock_bwd_policy_and_bt():
    """supported_bwd: 128-multiple channels with a fitting VMEM estimate;
    the 32x32 cin=384 concat pair must fall back (estimate over budget)."""
    from gddim_tpu.ops import resblock_bwd as rbw

    assert rbw.supported_bwd((64, 32, 32, 128), 128)
    assert rbw.supported_bwd((64, 8, 8, 256), 256)
    assert not rbw.supported_bwd((64, 32, 32, 120), 128)  # lane alignment
    # the wide-cin concat pairs exceed the VMEM estimate at 16x16/512 and
    # fall back to the XLA recompute path (round-5 coverage frontier)
    assert rbw._pick_bt_bwd(64, 32, 32, 384, 128, 3) in (0, 1)


def test_make_fused_resblock_train_pallas_bwd_gate(monkeypatch):
    """GDDIM_FUSED_BWD=0 forces the XLA recompute backward; on CPU the
    Pallas path is never taken regardless (backend gate)."""
    import gddim_tpu.ops.resblock as R

    monkeypatch.setenv("GDDIM_FUSED_BWD", "0")
    f = R.make_fused_resblock_train(
        num_groups1=32, num_groups2=32, keep_prob=1.0, has_skip=False
    )
    x = jnp.ones((1, 8, 8, 128), jnp.float32)
    temb = jnp.zeros((1, 128), jnp.float32)
    ones = jnp.ones((128,), jnp.float32)
    zeros = jnp.zeros((128,), jnp.float32)
    w = jnp.zeros((3, 3, 128, 128), jnp.float32)
    wsp, bsp = jnp.zeros((1, 1)), jnp.zeros((1,))
    mask = jnp.ones((1, 8, 8, 128), jnp.int8)
    out, grads = jax.value_and_grad(
        lambda xx: jnp.sum(
            f(xx, temb, ones, zeros, w, zeros, ones, zeros, w, zeros,
              wsp, bsp, mask) ** 2
        )
    )(x)
    assert np.isfinite(float(out))
    assert np.isfinite(np.asarray(grads)).all()


def test_make_fused_attnblock_train_gradients_match_unfused(rng):
    """make_fused_attnblock_train's custom_vjp backward == plain autodiff
    of the unfused composition. On CPU the wrapper's forward falls back to
    the reference, making the check exact."""
    from gddim_tpu.ops.attnblock import (
        attnblock_reference,
        make_fused_attnblock_train,
    )

    B, H, C = 2, 8, 128
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    args = [f32(B, H, H, C), f32(C) * 0.1 + 1.0, f32(C) * 0.1]
    for _ in range(4):  # q, k, v, o NINs
        args += [f32(C, C) * 0.1, f32(C) * 0.1]
    f = make_fused_attnblock_train(num_groups=32, skip_rescale=True)
    idx = tuple(range(len(args)))
    g_fused = jax.grad(lambda *a: jnp.sum(f(*a) ** 2), argnums=idx)(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(
            attnblock_reference(*a, num_groups=32, skip_rescale=True) ** 2
        ),
        argnums=idx,
    )(*args)
    for i, (gf, gr) in enumerate(zip(g_fused, g_ref)):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-6,
            err_msg=f"arg{i}",
        )


def test_attnblock_fused_train_module_matches_normal(rng, monkeypatch):
    """AttnBlockpp in TRAIN mode dispatching to the fused-train kernel
    (interpret mode) matches the composable-module path on identical
    params — values AND parameter gradients. (The path ships default-off —
    measured negative end-to-end — so the gate env is set explicitly.)"""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("GDDIM_FUSED_ATTN_TRAIN", "1")

    from gddim_tpu.models import layers
    from gddim_tpu.models.blocks import AttnBlockpp
    from gddim_tpu.ops import attnblock as ab

    block = AttnBlockpp(skip_rescale=True)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    params = block.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def loss(p, fused):
        old_ft, old_sup = layers.FUSED_TRAIN, ab.supported
        try:
            layers.FUSED_TRAIN = fused
            ab.supported = lambda shape: shape[-1] % 128 == 0
            out = block.apply(p, x, train=True)
        finally:
            layers.FUSED_TRAIN, ab.supported = old_ft, old_sup
        return jnp.sum(out**2), out

    with pltpu.force_tpu_interpret_mode():
        (l_f, out_f), g_f = jax.value_and_grad(loss, has_aux=True)(params, True)
    (l_r, out_r), g_r = jax.value_and_grad(loss, has_aux=True)(params, False)
    rel = np.abs(np.asarray(out_f) - np.asarray(out_r)).max() / np.abs(
        np.asarray(out_r)
    ).max()
    assert rel < 2e-3, rel
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = jax.tree.leaves(g_r)
    assert len(flat_f) == len(flat_r)
    for (path, gf), gr in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_resblock_bwd_default_map(monkeypatch):
    """The round-5 probe-confirmed default map enables the 32x32 pair
    backward at bt=1 (the estimator alone rejects it); env value 0 vetoes."""
    from gddim_tpu.ops import resblock_bwd as rbw

    monkeypatch.delenv("GDDIM_BWD_BT_MAP", raising=False)
    monkeypatch.delenv("GDDIM_BWD_BT", raising=False)
    assert rbw._pick_bt_bwd(64, 32, 32, 256, 128, 3) == 1
    assert rbw.supported_bwd((64, 32, 32, 256), 128)
    monkeypatch.setenv("GDDIM_BWD_BT_MAP", "1024.256:0")
    assert not rbw.supported_bwd((64, 32, 32, 256), 128)
