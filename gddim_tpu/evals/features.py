"""Feature extractors for FID/IS, sharded over the JAX mesh.

The reference runs a TF-Hub Inception graph on the training devices via
`tf.split`/`tf.function` (cld_jax/evaluation.py:112-150) — fragile on TPU
VMs and impossible in no-network environments. Here the extractor is a plain
jitted JAX function sharded over the mesh 'data' axis:

- `inception`: a JAX InceptionV3 port loading weights from a local .npz
  (config.eval.inception_weights). Produces tfgan-compatible 2048-d pool
  features + 1008/1000-d logits. Without a weights file it is unavailable.
- `proxy`: a fixed-seed random convolutional feature extractor. Deterministic
  and distribution-sensitive — usable for pipeline tests, regression tracking
  and relative comparisons where true Inception weights cannot be shipped.
  (Proxy-FID is NOT comparable to published FID numbers; the report records
  which extractor produced it.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class FeatureExtractor:
    def __init__(self, name, apply_fn, feature_dim, logits_dim):
        self.name = name
        self.apply_fn = apply_fn  # (uint8/float images NHWC in [0,255]) -> dict
        self.feature_dim = feature_dim
        self.logits_dim = logits_dim


def _proxy_extractor(image_size: int, channels: int = 3, dim: int = 256):
    """Fixed-seed 3-layer random conv net + global pooling moments."""
    rng = np.random.default_rng(1234)
    k1 = jnp.asarray(rng.normal(size=(3, 3, channels, 32)) / np.sqrt(9 * channels), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 32, 64)) / np.sqrt(9 * 32), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 64, dim // 2)) / np.sqrt(9 * 64), jnp.float32)
    w_logits = jnp.asarray(rng.normal(size=(dim, 100)) / np.sqrt(dim), jnp.float32)

    def conv(x, k, stride):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def apply_fn(images):
        x = images.astype(jnp.float32) / 127.5 - 1.0
        h = jax.nn.gelu(conv(x, k1, 2))
        h = jax.nn.gelu(conv(h, k2, 2))
        h = jax.nn.gelu(conv(h, k3, 2))
        mean = h.mean(axis=(1, 2))
        std = h.std(axis=(1, 2))
        pool = jnp.concatenate([mean, std], axis=-1)  # (B, dim)
        logits = pool @ w_logits
        return {"pool_3": pool, "logits": logits}

    return FeatureExtractor("proxy", apply_fn, dim, 100)


def get_feature_extractor(config) -> FeatureExtractor:
    weights = str(getattr(config.eval, "inception_weights", "") or "")
    if weights:
        from gddim_tpu.evals.inception import load_inception_extractor

        return load_inception_extractor(weights)
    return _proxy_extractor(config.data.image_size, config.data.num_channels)


def run_features_sharded(extractor: FeatureExtractor, images: np.ndarray,
                         batch_size: int = 256, mesh=None):
    """Extract features for a uint8 image corpus, batched (and mesh-sharded).

    Replacement for `run_inception_distributed` (evaluation.py:112-150): one
    jitted apply over batches; with a mesh the batch axis is sharded so the
    conv net runs data-parallel over all chips.
    """
    pools, logits = [], []
    n = len(images)
    apply_fn = extractor.apply_fn
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))
        base_apply = apply_fn

        def apply_fn(x):
            return base_apply(jax.device_put(x, sharding))

    n_dev = 1
    if mesh is not None:  # P('data') needs divisibility by the data axis only
        n_dev = (
            mesh.shape["data"] if "data" in mesh.axis_names
            else mesh.devices.size
        )
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        valid = len(chunk)
        if valid % n_dev != 0:  # pad the tail chunk to shardable size
            pad = n_dev - valid % n_dev
            chunk = np.concatenate([chunk, chunk[:pad]])
        out = apply_fn(jnp.asarray(chunk))
        pools.append(np.asarray(out["pool_3"])[:valid])
        logits.append(np.asarray(out["logits"])[:valid])
    return np.concatenate(pools), np.concatenate(logits)
