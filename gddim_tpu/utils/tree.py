"""Small config/pytree helpers (parity with cld_jax/utils.py:111-123)."""

from __future__ import annotations


def flatten_config(cfg, prefix: str = "") -> dict:
    """Flatten a nested ConfigDict/dict into dot-separated keys."""
    out = {}
    items = cfg.items() if hasattr(cfg, "items") else vars(cfg).items()
    for k, v in items:
        key = f"{prefix}.{k}" if prefix else str(k)
        if hasattr(v, "items") or (hasattr(v, "__dict__") and not isinstance(v, (int, float, str, bool, list, tuple))):
            try:
                out.update(flatten_config(v, key))
                continue
            except Exception:
                pass
        out[key] = v
    return out
