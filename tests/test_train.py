"""Training stack: loss sanity, jitted multi-step scan, mesh sharding, EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.data import get_dataset, get_data_scaler
from gddim_tpu.math.cld import CLD
from gddim_tpu.models import init_model
from gddim_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch
from gddim_tpu.train import (
    create_train_state,
    make_cld_loss_fn,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def points_setup():
    cfg = get_config("cld/points")
    cfg.training.batch_size = 128
    cfg.training.n_jitted_steps = 2
    cfg.model.nf = 64
    cfg.model.num_layers = 2
    cfg.optim.warmup = 0  # default 5000 would keep lr ~0 for a short test
    cfg.optim.lr = 2e-3
    rng = jax.random.PRNGKey(cfg.seed)
    model, model_state, params = init_model(rng, cfg)
    sde = CLD.from_config(cfg)
    state = create_train_state(jax.random.PRNGKey(1), cfg, params, model_state)
    loss_fn = make_cld_loss_fn(sde, model, train=True)
    return cfg, model, sde, state, loss_fn


def test_loss_magnitude(points_setup):
    """At init the eps-matching loss ~= E|z|^2 = 1 per dim (model outputs ~0)."""
    cfg, model, sde, state, loss_fn = points_setup
    batch = {"image": jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)), jnp.float32)}
    loss, (info, _) = loss_fn(jax.random.PRNGKey(0), state.params, state.model_state, batch)
    assert 0.5 < float(loss) < 2.0


def test_train_step_decreases_loss(points_setup):
    cfg, model, sde, state, loss_fn = points_setup
    train_step = make_train_step(cfg, loss_fn, donate=False)
    train_iter, _ = get_dataset(cfg, additional_dim=cfg.training.n_jitted_steps)
    scaler = get_data_scaler(cfg)

    losses = []
    for i in range(60):
        batch = jax.tree.map(
            lambda x: jnp.asarray(scaler(x)), next(train_iter)
        )
        state, info = train_step(state, batch)
        losses.append(float(info["score_loss"]))
    assert state.step == 120
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.9, (first, last)


def test_ema_tracks_params(points_setup):
    cfg, model, sde, state, loss_fn = points_setup
    from gddim_tpu.train.state import ema_update

    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


def test_sharded_train_step_runs_on_mesh(points_setup):
    """The same train step runs with the batch sharded over an 8-device mesh
    and produces the same result as the single-device path."""
    cfg, model, sde, state, loss_fn = points_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    train_step = make_train_step(cfg, loss_fn, mesh=mesh, donate=False)

    batch = {
        "image": jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 128, 2)), jnp.float32
        )
    }
    state_m = replicate_to_mesh(state, mesh)
    batch_m = jax.tree.map(
        lambda x: jax.device_put(
            x,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data")
            ),
        ),
        batch,
    )
    new_state, info = train_step(state_m, batch_m)
    assert np.isfinite(float(info["score_loss"]))

    # single-device reference result
    train_step_1 = make_train_step(cfg, loss_fn, donate=False)
    new_state_1, info_1 = train_step_1(state, batch)
    np.testing.assert_allclose(
        float(info["score_loss"]), float(info_1["score_loss"]), rtol=1e-5
    )
    # parameters updated identically (allreduce == serial gradient)
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(new_state_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_eval_step(points_setup):
    cfg, model, sde, state, loss_fn = points_setup
    from gddim_tpu.train import make_cld_loss_fn

    eval_loss = make_cld_loss_fn(sde, model, train=False)
    eval_step = make_eval_step(cfg, eval_loss)
    batch = {"image": jnp.zeros((16, 2))}
    info = eval_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(info["score_loss"]))


def test_warmup_schedule():
    cfg = get_config("cld/points")
    cfg.optim.warmup = 10
    from gddim_tpu.train.state import make_optimizer

    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(4)}
    opt_state = tx.init(params)
    g = {"w": jnp.ones(4)}
    # first update uses lr*min(0/10,1)=0 -> with optax count starting at 0 the
    # first scale is 0/10... optax increments count after; effective first-step
    # lr is schedule(0)=0: update must be ~0
    updates, opt_state = tx.update(g, opt_state, params)
    assert np.abs(np.asarray(updates["w"])).max() < 1e-12
    updates, opt_state = tx.update(g, opt_state, params)
    assert np.abs(np.asarray(updates["w"])).max() > 1e-6


def test_swap_params_from_ema():
    """The ema_update_freq swap (reference run_lib.py:203-209): params become
    params_ema and the optimizer state is re-initialized."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gddim_tpu.configs import get_config
    from gddim_tpu.train.state import create_train_state, swap_params_from_ema

    cfg = get_config("cld/points")
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = create_train_state(jax.random.PRNGKey(0), cfg, params, {})
    state = state.replace(params_ema={"w": jnp.full((3,), 2.0), "b": jnp.ones((2,))})
    # dirty the optimizer state so the reset is observable
    dirty = jax.tree.map(lambda x: x + 1.0 if x.dtype.kind == "f" else x, state.opt_state)
    state = state.replace(opt_state=dirty)
    new = swap_params_from_ema(state, cfg)
    np.testing.assert_allclose(np.asarray(new.params["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(new.params["b"]), 1.0)
    # Adam moments restart at zero
    flat = [np.asarray(x) for x in jax.tree.leaves(new.opt_state) if hasattr(x, "dtype") and x.dtype.kind == "f" and x.ndim > 0]
    assert flat and all(np.allclose(x, 0.0) for x in flat)


def test_remat_modes_grads_match():
    """remat=False / True / 'convs' / 'convs_lean' are pure memory policies:
    loss AND grads must be bit-comparable on a tiny NCSN++ (the 'convs'
    policy additionally saves post-dropout activations — the saved tensor
    must equal what the recompute would have produced)."""
    def make_cfg(remat_mode):
        # fresh config per mode: ml_collections type-locks the remat field
        # to whatever type first creates it (bool vs str)
        cfg = get_config("cld/simple_cifar10")
        cfg.model.nf = 32
        cfg.model.num_res_blocks = 1
        cfg.model.ch_mult = (1, 2)
        cfg.model.attn_resolutions = (16,)
        cfg.model.dropout = 0.1
        cfg.training.batch_size = 4
        cfg.model.remat = remat_mode
        return cfg

    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 32, 32, 3)) * 0.3,
            jnp.float32,
        )
    }
    rng = jax.random.PRNGKey(0)
    results = {}
    for mode in (False, True, "convs", "convs_lean"):
        cfg = make_cfg(mode)
        model, mstate, params = init_model(jax.random.PRNGKey(cfg.seed), cfg)
        sde = CLD.from_config(cfg)
        loss_fn = make_cld_loss_fn(sde, model, train=True)
        (loss, _), grads = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
            rng, params, mstate, batch
        )
        results[mode] = (float(loss), grads)

    base_loss, base_grads = results[False]
    for mode in (True, "convs", "convs_lean"):
        loss, grads = results[mode]
        assert abs(loss - base_loss) < 1e-5 * max(1.0, abs(base_loss)), mode
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
            ),
            base_grads, grads,
        )
