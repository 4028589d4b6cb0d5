"""Content-addressed caching for host-side coefficient precompute.

Replaces the reference's sha1-keyed pickle cache (cld_jax/sde_lib.py:308-319,
:109-115) with deterministic, device-independent ``.npz`` files keyed by a
content hash of the defining parameters.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np


def cache_dir() -> Path:
    d = os.environ.get("GDDIM_CACHE_DIR")
    if d is None:
        d = os.path.join(os.path.expanduser("~"), ".cache", "gddim_tpu")
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def content_key(*parts) -> str:
    """Stable hash of a heterogeneous tuple of floats/ints/strings/arrays."""
    h = hashlib.sha1()
    for part in parts:
        if isinstance(part, np.ndarray):
            h.update(b"arr")
            h.update(str(part.shape).encode())
            h.update(str(part.dtype).encode())
            h.update(np.ascontiguousarray(part).tobytes())
        else:
            h.update(repr(part).encode())
        h.update(b"|")
    return h.hexdigest()


def load_npz_cache(name: str, key: str):
    path = cache_dir() / f"{name}_{key}.npz"
    if not path.exists():
        return None
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_npz_cache(name: str, key: str, **arrays) -> Path:
    path = cache_dir() / f"{name}_{key}.npz"
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path
