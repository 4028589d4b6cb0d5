"""The SURVEY section-7 'minimum end-to-end slice': train the ps_fmlp toy on the
olympic-rings point set, then sample with gDDIM and check the generated
distribution statistically matches the data. Exercises every layer
(config -> data -> model -> loss -> train -> coefficients -> sampler)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.data import get_data_scaler, get_dataset
from gddim_tpu.math.cld import CLD
from gddim_tpu.models import init_model, make_cld_eps_fn
from gddim_tpu.samplers.factory import build_cld_sampler
from gddim_tpu.train import create_train_state, make_cld_loss_fn, make_train_step


@pytest.mark.slow
def test_pointset_training_learns_distribution():
    cfg = get_config("cld/points")
    cfg.model.nf = 128
    cfg.model.num_layers = 3
    cfg.training.batch_size = 512
    cfg.training.n_jitted_steps = 25
    cfg.optim.warmup = 100
    cfg.optim.lr = 1e-3
    # EMA at the production rate (0.999) would still be ~22% random init
    # after this short run, deflating eps and blowing up the amplifying
    # reverse transition; use a faster EMA for the smoke-scale run.
    cfg.model.ema_rate = 0.95
    cfg.sampling.method = "sscs"  # stochastic sampler: robust to the
    # imperfect score of a smoke-scale run (deterministic PF samplers need a
    # near-converged score; the reference trains 1M steps)
    cfg.sampling.nfe = 100
    cfg.sampling.deis_order = 2

    rng = jax.random.PRNGKey(0)
    model, model_state, params = init_model(rng, cfg)
    sde = CLD.from_config(cfg)
    state = create_train_state(jax.random.PRNGKey(1), cfg, params, model_state)
    loss_fn = make_cld_loss_fn(sde, model, train=True)
    train_step = make_train_step(cfg, loss_fn, donate=False)
    train_iter, _ = get_dataset(cfg, additional_dim=cfg.training.n_jitted_steps)
    scaler = get_data_scaler(cfg)

    losses = []
    for _ in range(60):  # 1500 steps
        batch = jax.tree.map(lambda x: jnp.asarray(scaler(x)), next(train_iter))
        state, info = train_step(state, batch)
        losses.append(float(np.asarray(info["score_loss"])))
    assert np.mean(losses[-5:]) < np.mean(losses[:3]) * 0.7

    from gddim_tpu.data import get_data_inverse_scaler

    eps_apply = make_cld_eps_fn(sde, model, train=False)
    inv = get_data_inverse_scaler(cfg)
    sample_fn = build_cld_sampler(cfg, sde, eps_apply, (2,), inverse_scaler=inv)
    variables = {"params": state.params_ema, **state.model_state}
    x, v, nfe = sample_fn(jax.random.PRNGKey(2), variables, batch_size=2048)
    x = np.asarray(x)
    assert nfe == 100
    assert np.isfinite(x).all()

    # statistical match against the (normalized, unscaled) data corpus
    data = next(iter(train_iter))["image"].reshape(-1, 2)
    assert np.abs(x.mean(0) - data.mean(0)).max() < 0.25
    assert np.abs(x.std(0) - data.std(0)).max() < 0.25
    # the rings occupy an annular region: samples should avoid the center
    # and stay within the data's support radius
    r = np.linalg.norm(x - x.mean(0), axis=1)
    r_data = np.linalg.norm(data - data.mean(0), axis=1)
    assert abs(np.median(r) - np.median(r_data)) < 0.3
    assert np.quantile(r, 0.95) < np.quantile(r_data, 0.999) + 0.5
