"""Param-tree golden parity: our NCSN++ vs the reference model, leaf by leaf.

A single silent module-order difference breaks every published checkpoint
(flax auto-numbers scopes by creation order, e.g. Conv_0..Conv_k). This test
initializes the REFERENCE NCSNpp (loaded read-only from /root/reference via
tests/refshim_model.py) and our gddim_tpu model under jax.eval_shape and
asserts the flattened (path -> shape) maps are identical for the release
(accr_dcifar10) and ddpmpp config families.
"""

import jax
import jax.numpy as jnp
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.models.registry import get_model

from refshim_model import load_reference_ncsnpp


def _shape_map(model, config):
    b, s = 1, int(config.data.image_size)
    c = 2 * int(config.data.num_channels)
    x = jnp.zeros((b, s, s, c), jnp.float32)
    t = jnp.zeros((b,), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
    )
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    return {
        "/".join(str(k) for k in path): tuple(leaf.shape) for path, leaf in flat
    }


@pytest.mark.parametrize("name", ["cld/accr_dcifar10", "cld/ddpmpp_cifar10"])
def test_ncsnpp_param_tree_matches_reference(name):
    config = get_config(name)
    # force the pure-f32 XLA-reference path: kernel/dtype knobs must not alter
    # the tree, but pin them anyway so this test isolates scope-name parity
    config.model.dtype = "float32"

    ours = _shape_map(get_model("ncsnpp")(config=config), config)
    ref = _shape_map(load_reference_ncsnpp()(config=config), config)

    missing = sorted(set(ref) - set(ours))
    extra = sorted(set(ours) - set(ref))
    assert not missing and not extra, (
        f"scope mismatch vs reference:\n missing={missing[:10]}\n extra={extra[:10]}"
    )
    wrong = {k: (ours[k], ref[k]) for k in ref if ours[k] != ref[k]}
    assert not wrong, f"shape mismatch vs reference: {dict(list(wrong.items())[:10])}"
    assert len(ref) > 100  # sanity: the deep model really was traversed


def test_wideresnet_param_tree_matches_reference():
    """Classifier checkpoint compatibility: our WideResNet's parameter tree
    (scope names + shapes) equals the reference model's
    (cld_jax/models/wideresnet_noise_conditional.py:297-322)."""
    import jax
    import jax.numpy as jnp

    from gddim_tpu.models.wideresnet import WideResnet
    from tests.refshim_model import load_reference_wideresnet

    RefWRN = load_reference_wideresnet()
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    s = jnp.full((2,), 0.5, jnp.float32)

    def tree_shapes(model):
        var_shapes = jax.eval_shape(
            lambda k: model.init({"params": k}, x, s, train=False),
            jax.random.PRNGKey(0),
        )
        flat = jax.tree_util.tree_flatten_with_path(var_shapes["params"])[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): v.shape
            for path, v in flat
        }

    ref_shapes = tree_shapes(
        RefWRN(blocks_per_group=4, channel_multiplier=10, num_outputs=10)
    )
    our_shapes = tree_shapes(
        WideResnet(blocks_per_group=4, channel_multiplier=10, num_outputs=10)
    )
    assert our_shapes == ref_shapes
    assert any("pre-pool-bn" in k for k in ref_shapes)
