"""Checkpointing: orbax two-tier manager + legacy flax-0.3.1 msgpack loader."""

import numpy as np
import jax
import jax.numpy as jnp
import msgpack
import pytest

from gddim_tpu.checkpoints import CheckpointManager, load_legacy_checkpoint
from gddim_tpu.checkpoints.legacy import into_train_state
from gddim_tpu.configs import get_config
from gddim_tpu.models import init_model
from gddim_tpu.train import create_train_state


def _pack_legacy(tree):
    """Serialize a pytree the way flax 0.3.1 msgpack serialization does."""

    def default(obj):
        if isinstance(obj, np.ndarray):
            return msgpack.ExtType(
                1,
                msgpack.packb(
                    (list(obj.shape), obj.dtype.name, obj.tobytes()),
                    use_bin_type=True,
                ),
            )
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        raise TypeError(type(obj))

    return msgpack.packb(tree, default=default, use_bin_type=True)


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


@pytest.fixture(scope="module")
def small_state():
    cfg = get_config("cld/points")
    cfg.model.nf = 32
    cfg.model.num_layers = 2
    model, model_state, params = init_model(jax.random.PRNGKey(0), cfg)
    state = create_train_state(jax.random.PRNGKey(1), cfg, params, model_state)
    return cfg, state


def test_legacy_roundtrip(tmp_path, small_state):
    """A reference-layout msgpack checkpoint loads onto a fresh TrainState."""
    cfg, state = small_state
    params_np = _np_tree(state.params)
    fake_moments = jax.tree.map(lambda x: np.full_like(x, 0.25), params_np)
    legacy_tree = {
        "step": 1234,
        "optimizer": {
            "state": {
                "step": 1234,
                "param_states": jax.tree.map(
                    lambda m: None, params_np, is_leaf=lambda x: False
                )
                or {},
            },
            "target": params_np,
        },
        "lr": 2e-4,
        "model_state": {},
        "ema_rate": 0.9999,
        "params_ema": jax.tree.map(lambda x: x * 2.0, params_np),
        "rng": np.zeros(2, dtype=np.uint32),
    }
    # build param_states with adam moment leaves ({grad_ema, grad_sq_ema})
    def to_pstate(x):
        return {"grad_ema": np.full_like(x, 0.25), "grad_sq_ema": np.full_like(x, 0.5)}

    def map_params(t):
        if isinstance(t, dict):
            return {k: map_params(v) for k, v in t.items()}
        return to_pstate(t)

    legacy_tree["optimizer"]["state"]["param_states"] = map_params(params_np)

    path = tmp_path / "checkpoint_15"
    path.write_bytes(_pack_legacy(legacy_tree))

    legacy = load_legacy_checkpoint(path)
    assert legacy["step"] == 1234
    np.testing.assert_allclose(
        jax.tree.leaves(legacy["params"])[0], jax.tree.leaves(params_np)[0]
    )

    new_state = into_train_state(legacy, state)
    assert int(new_state.step) == 1234
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(new_state.params_ema)[0]),
        2.0 * jax.tree.leaves(params_np)[0],
        rtol=1e-6,
    )
    # adam moments grafted
    import optax

    def find_adam(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node
        if isinstance(node, tuple):
            for x in node:
                r = find_adam(x)
                if r is not None:
                    return r
        return None

    adam = find_adam(new_state.opt_state)
    assert adam is not None
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(adam.mu)[0]), 0.25)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(adam.nu)[0]), 0.5)


def test_orbax_manager_roundtrip(tmp_path, small_state):
    cfg, state = small_state
    mgr = CheckpointManager(tmp_path)
    mgr.save_meta(5, state)
    mgr.save_snapshot(1, state)
    mgr.wait()
    template = jax.tree.map(jnp.zeros_like, state)
    restored, step = mgr.restore_latest_meta(template)
    assert step == 5
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    assert mgr.snapshot_steps() == [1]


def test_fresh_start_when_no_checkpoint(tmp_path, small_state):
    cfg, state = small_state
    mgr = CheckpointManager(tmp_path / "empty")
    restored, step = mgr.restore_latest_meta(state)
    assert step == 0
    assert restored is state


def test_legacy_export_import_roundtrip(tmp_path, small_state):
    """Export a TrainState in the reference layout, reload it, get the same
    params/EMA/moments back (both-direction checkpoint interchange)."""
    from gddim_tpu.checkpoints.legacy import export_legacy_checkpoint

    cfg, state = small_state
    # give the optimizer some non-trivial moments first
    import jax
    import optax

    state = state.replace(step=jnp.asarray(7, dtype=state.step.dtype))
    path = export_legacy_checkpoint(tmp_path / "checkpoint_7", state)
    legacy = load_legacy_checkpoint(path)
    assert legacy["step"] == 7
    for a, b in zip(
        jax.tree.leaves(legacy["params"]), jax.tree.leaves(_np_tree(state.params))
    ):
        np.testing.assert_allclose(a, b)
    restored = into_train_state(legacy, state)
    for a, b in zip(
        jax.tree.leaves(restored.params_ema), jax.tree.leaves(state.params_ema)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
