"""Jitted training/eval steps over a device mesh.

TPU-native replacement for the reference's `pmap(scan(step_fn))` + `pmean`
(cld_jax/run_lib.py:144-149, losses.py:125-188): one global `jax.jit` with the
batch sharded over the mesh 'data' axis and the state replicated — XLA inserts
the gradient all-reduce over ICI. `n_jitted_steps` batches are scanned inside
the jit exactly like the reference, the state buffers are donated, and the
per-example RNG uses the partitionable threefry so noise generation shards
with the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from gddim_tpu.train.state import ema_update, make_optimizer


def make_train_step(config, loss_fn, mesh=None, donate: bool = True):
    """Returns train_step(state, batches) -> (state, info).

    batches: pytree with leaves shaped [n_jitted_steps, batch, ...] (the
    reference's layout minus the pmap device axis, run_lib.py:121-125).

    Buffer donation halves state memory on TPU but (a) deadlocks the forced
    host-platform CPU backend's all-reduce rendezvous and (b) raises
    InvalidArgument on the tunneled 'axon' TPU backend when the donated state
    is fetched back; donation is therefore gated on the backend.
    """
    import os

    tx = make_optimizer(config)
    donate = (
        donate
        and jax.default_backend() != "cpu"
        and os.environ.get("JAX_PLATFORMS", "") != "axon"
    )

    def one_step(carry, batch):
        rng, state = carry
        rng, step_rng = jax.random.split(rng)
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch,
                jax.tree.map(
                    lambda x: NamedSharding(mesh, P("data")), batch
                ),
            )
        grad_fn = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)
        (loss, (info, new_model_state)), grads = grad_fn(
            step_rng, state.params, state.model_state, batch
        )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = ema_update(state.params_ema, new_params, state.ema_rate)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=new_model_state,
            params_ema=new_ema,
        )
        return (rng, new_state), info

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batches):
        (rng, new_state), infos = lax.scan(
            one_step, (state.rng, state), batches
        )
        new_state = new_state.replace(rng=rng)
        return new_state, jax.tree.map(jnp.mean, infos)

    return train_step


def make_eval_step(config, loss_fn):
    """Eval loss on params_ema (reference losses.py:179-181)."""

    @jax.jit
    def eval_step(state, batch, rng):
        loss, (info, _) = loss_fn(rng, state.params_ema, state.model_state, batch)
        return info

    return eval_step
