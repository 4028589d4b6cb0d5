"""Model registry (parity: cld_jax/models/utils.py:43-66)."""

from __future__ import annotations

_MODELS: dict[str, type] = {}


def register_model(cls=None, *, name: str | None = None):
    def _register(c):
        local_name = name if name is not None else c.__name__
        if local_name in _MODELS and _MODELS[local_name] is not c:
            raise ValueError(f"Already registered model with name: {local_name}")
        _MODELS[local_name] = c
        return c

    return _register if cls is None else _register(cls)


def get_model(name: str) -> type:
    return _MODELS[name]


def available_models() -> tuple[str, ...]:
    return tuple(sorted(_MODELS))
