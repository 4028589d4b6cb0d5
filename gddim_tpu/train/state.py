"""Training state + optimizer (optax port of the reference's flax.optim stack).

Reference semantics (cld_jax/losses.py:27-61, models/utils.py:32-40):
- Adam(beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=0)
- linear LR warmup: lr * min(step / warmup, 1)
- global-norm gradient clipping to `grad_clip`
- EMA of params at `ema_rate`
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any
    model_state: Any  # mutable collections (empty for GroupNorm nets)
    params_ema: Any
    rng: Any
    lr: float = flax.struct.field(pytree_node=False)
    ema_rate: float = flax.struct.field(pytree_node=False)


def make_optimizer(config) -> optax.GradientTransformation:
    optim = config.optim
    if optim.optimizer != "Adam":
        raise NotImplementedError(f"Optimizer {optim.optimizer} not supported yet!")
    warmup = float(optim.warmup)
    base_lr = float(optim.lr)

    def schedule(step):
        if warmup > 0:
            return base_lr * jnp.minimum(step / warmup, 1.0)
        return base_lr

    parts = []
    if float(optim.grad_clip) >= 0:
        parts.append(optax.clip_by_global_norm(float(optim.grad_clip)))
    adam = optax.adam(
        learning_rate=schedule, b1=float(optim.beta1), eps=float(optim.eps)
    )
    if float(optim.weight_decay) > 0:
        adam = optax.adamw(
            learning_rate=schedule,
            b1=float(optim.beta1),
            eps=float(optim.eps),
            weight_decay=float(optim.weight_decay),
        )
    parts.append(adam)
    return optax.chain(*parts)


def create_train_state(rng, config, params, model_state) -> TrainState:
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        model_state=model_state,
        params_ema=params,
        rng=rng,
        lr=float(config.optim.lr),
        ema_rate=float(config.model.ema_rate),
    )


def swap_params_from_ema(state: TrainState, config) -> TrainState:
    """params <- params_ema with a freshly initialized optimizer — the
    reference's occasional "update from ema" convergence trick
    (cld_jax/run_lib.py:203-209: rebuilds the flax optimizer around
    params_ema every training.ema_update_freq steps)."""
    tx = make_optimizer(config)
    return state.replace(
        params=state.params_ema, opt_state=tx.init(state.params_ema)
    )


def ema_update(params_ema, params, rate):
    """p_ema <- p_ema * rate + p * (1 - rate) (reference losses.py:168-171)."""
    return jax.tree.map(
        lambda e, p: e * rate + p * (1.0 - rate), params_ema, params
    )
