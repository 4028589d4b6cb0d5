"""Loader for the reference's published checkpoints.

The published gDDIM checkpoints are flax 0.3.1 msgpack serializations of the
`State` dataclass (reference cld_jax/models/utils.py:32-40) written by
`flax.training.checkpoints.save_checkpoint` (run_lib.py:197,240):

    {step, optimizer: {state: {step, param_states: <adam mu/nu tree>},
                       target: <param tree>},
     lr, model_state, ema_rate, params_ema, rng}

Because gddim_tpu's NCSN++ reproduces the reference's auto-numbered linen
scopes (see gddim_tpu/models/blocks.py), `optimizer.target` / `params_ema`
map directly onto the new parameter tree; Adam moments map into the optax
`ScaleByAdamState` (mu/nu) so training can resume from a legacy checkpoint.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import msgpack
import numpy as np


def _unpack(raw: bytes):
    """msgpack -> nested dict of numpy arrays (flax serialization format)."""

    def hook(code, data):
        if code == 1:  # flax's _MsgpackExtType.ndarray
            shape, dtype_name, buf = msgpack.unpackb(data, raw=True)
            return np.frombuffer(buf, dtype=np.dtype(dtype_name)).reshape(shape)
        return msgpack.ExtType(code, data)

    return msgpack.unpackb(raw, ext_hook=hook, raw=False, strict_map_key=False)


def legacy_state_dict(path: str | Path) -> dict:
    """Raw nested dict from a legacy flax checkpoint file."""
    return _unpack(Path(path).read_bytes())


def load_legacy_checkpoint(path: str | Path) -> dict:
    """Extract the pieces gddim_tpu needs from a legacy checkpoint.

    Returns {step, params, params_ema, adam_mu, adam_nu, lr, ema_rate}.
    """
    raw = legacy_state_dict(path)
    opt = raw["optimizer"]
    out = {
        "step": int(np.asarray(raw["step"])),
        "params": opt["target"],
        "params_ema": raw["params_ema"],
        "lr": float(np.asarray(raw.get("lr", 2e-4))),
        "ema_rate": float(np.asarray(raw.get("ema_rate", 0.9999))),
        "adam_mu": None,
        "adam_nu": None,
    }
    pstates = opt.get("state", {}).get("param_states")
    if pstates is not None:
        out["adam_mu"] = _map_tree(pstates, "grad_ema")
        out["adam_nu"] = _map_tree(pstates, "grad_sq_ema")
    return out


def _map_tree(tree, leaf_key):
    """Extract `leaf_key` from each flax.optim param-state node."""
    if isinstance(tree, dict):
        if leaf_key in tree and not isinstance(tree[leaf_key], dict):
            return tree[leaf_key]
        return {k: _map_tree(v, leaf_key) for k, v in tree.items()}
    return tree


def into_train_state(legacy: dict, state):
    """Graft legacy params/EMA (and Adam moments when shapes match) onto a
    fresh TrainState built from the same config."""
    import jax

    def cast_like(template, value_tree):
        return jax.tree.map(
            lambda t, v: jnp.asarray(v, dtype=t.dtype), template, value_tree
        )

    new = state.replace(
        step=jnp.asarray(legacy["step"], dtype=state.step.dtype),
        params=cast_like(state.params, legacy["params"]),
        params_ema=cast_like(state.params_ema, legacy["params_ema"]),
    )
    if legacy["adam_mu"] is not None:
        try:
            opt_state = state.opt_state
            # optax.chain(clip, adam) -> (ClipState, (ScaleByAdamState, ...))
            flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
            new_opt = _replace_adam_moments(
                opt_state, legacy["adam_mu"], legacy["adam_nu"], legacy["step"]
            )
            if new_opt is not None:
                new = new.replace(opt_state=new_opt)
        except Exception:
            pass  # resume-from-scratch moments are acceptable
    return new


def _replace_adam_moments(opt_state, mu, nu, step):
    import jax
    import optax

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jnp.asarray(step, dtype=node.count.dtype),
                mu=jax.tree.map(
                    lambda t, v: jnp.asarray(v, dtype=t.dtype), node.mu, mu
                ),
                nu=jax.tree.map(
                    lambda t, v: jnp.asarray(v, dtype=t.dtype), node.nu, nu
                ),
            )
        if isinstance(node, tuple):
            return tuple(walk(x) for x in node)
        return node

    return walk(opt_state)
