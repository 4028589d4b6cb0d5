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


def _pack(tree) -> bytes:
    """Nested dict of arrays -> flax-0.3.1-style msgpack bytes."""

    def default(obj):
        if isinstance(obj, jnp.ndarray):
            obj = np.asarray(obj)
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
        raise TypeError(f"unserializable leaf {type(obj)}")

    return msgpack.packb(tree, default=default, use_bin_type=True)


def export_legacy_checkpoint(path: str | Path, state) -> Path:
    """Write a TrainState in the reference's checkpoint layout.

    Produces the `{step, optimizer: {state: {step, param_states}, target},
    lr, model_state, ema_rate, params_ema, rng}` msgpack tree that
    `flax.training.checkpoints.restore_checkpoint` + the reference `State`
    dataclass expect — lets reference users consume gddim_tpu training runs.
    """
    import jax
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

    def np_tree(t):
        return jax.tree.map(lambda x: np.asarray(x), t)

    adam = find_adam(state.opt_state)
    if adam is not None:
        mu, nu = np_tree(adam.mu), np_tree(adam.nu)

        def pstates(m, n):
            if isinstance(m, dict):
                return {k: pstates(m[k], n[k]) for k in m}
            return {"grad_ema": m, "grad_sq_ema": n}

        param_states = pstates(mu, nu)
    else:
        param_states = {}
    tree = {
        "step": int(np.asarray(state.step)),
        "optimizer": {
            "state": {
                "step": int(np.asarray(state.step)),
                "param_states": param_states,
            },
            "target": np_tree(state.params),
        },
        "lr": float(state.lr),
        "model_state": np_tree(state.model_state) if state.model_state else {},
        "ema_rate": float(state.ema_rate),
        "params_ema": np_tree(state.params_ema),
        "rng": np.asarray(state.rng),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(_pack(tree))
    return path


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
