"""Input pipelines (numpy/threaded; no tf.data dependency).

Replaces the reference's tfds pipelines (cld_jax/datasets.py) with host-side
numpy iterators that emit the same batch layout the jitted train step scans
over: leaves shaped [n_jitted_steps, per_host_batch, ...] (the reference's
[local_devices, n_jitted_steps, per_device_batch] minus the pmap axis — the
mesh sharding handles devices). Sources:

- CIFAR-10 from a local directory (the standard python-pickle batches or an
  .npz with an 'images' array) — no-network environments;
- the synthetic "olympic rings" point set (reference :214-252);
- a deterministic synthetic image stream (data.synthetic=True) for smoke
  tests and benchmarking;
- uniform dequantization and random flips (reference :163-190);
- [0,1] <-> [-1,1] scalers (reference :25-40).

A background thread prefetches the next batch while the device computes.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from pathlib import Path

import numpy as np


def get_data_scaler(config):
    """[0,1] -> [-1,1] when data.centered (reference :25-31)."""
    if config.data.centered:
        return lambda x: x * 2.0 - 1.0
    return lambda x: x


def get_data_inverse_scaler(config):
    """[-1,1] -> [0,1] when data.centered (reference :34-40)."""
    if config.data.centered:
        return lambda x: (x + 1.0) / 2.0
    return lambda x: x


def get_data_shape(config):
    """Trailing data dims fed to samplers (reference utils.py:172-177)."""
    if "ps" in config.data.dataset.lower():
        return (config.data.dim,)
    return (
        config.data.image_size,
        config.data.image_size,
        config.data.num_channels,
    )


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def _load_cifar10_dir(data_dir: str, train: bool) -> np.ndarray:
    """Load CIFAR-10 from the standard `cifar-10-batches-py` pickles or .npz."""
    d = Path(data_dir)
    npz = d / ("cifar10_train.npz" if train else "cifar10_test.npz")
    if npz.exists():
        with np.load(npz) as z:
            return z["images"]
    batch_dir = d / "cifar-10-batches-py"
    if not batch_dir.exists() and (d / "data_batch_1").exists():
        batch_dir = d
    names = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )
    arrays = []
    for name in names:
        with open(batch_dir / name, "rb") as f:
            raw = pickle.load(f, encoding="bytes")
        arrays.append(raw[b"data"])
    data = np.concatenate(arrays).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return data  # uint8 NHWC


def _central_crop_resize(images: np.ndarray, crop: int | None, size: int) -> np.ndarray:
    """Per-dataset preprocessing (reference datasets.py:112-154): optional
    central crop then area resize to (size, size)."""
    n, h, w, c = images.shape
    if crop:
        top, left = (h - crop) // 2, (w - crop) // 2
        images = images[:, top : top + crop, left : left + crop]
        h = w = crop
    if h == size and w == size:
        return images
    # integer-factor area resize (nearest for upscale) without external deps
    out = np.zeros((n, size, size, c), dtype=images.dtype)
    ys = (np.arange(size) * h / size).astype(int)
    xs = (np.arange(size) * w / size).astype(int)
    out[:] = images[:, ys][:, :, xs]
    return out


_DATASET_CROPS = {
    # reference preprocessing (cld_jax/datasets.py:112-154)
    "celeba": 140,  # central crop 140 then resize
    "celebahq": None,
    "ffhq": None,
    "lsun": None,  # reference resizes then crops; approximated by crop+resize
    "svhn": None,
    "cifar10": None,
}


def _load_image_corpus(config, train: bool) -> np.ndarray:
    """Generic local corpus loader: cifar batches, an .npz with 'images', or a
    directory of image files. No-network replacement for the reference's
    tfds/TFRecord pipelines (datasets.py:107-162)."""
    name = config.data.dataset.lower()
    d = Path(config.data.data_dir)
    if name == "cifar10" and (
        (d / "cifar-10-batches-py").exists() or (d / "data_batch_1").exists()
        or (d / "cifar10_train.npz").exists()
    ):
        images = _load_cifar10_dir(config.data.data_dir, train)
    else:
        split = "train" if train else "test"
        npz = d / f"{name}_{split}.npz"
        if not npz.exists():
            npz = d / f"{name}.npz"
        if npz.exists():
            with np.load(npz) as z:
                images = z["images"]
        else:
            img_dir = d if d.is_dir() else None
            if img_dir is None:
                raise FileNotFoundError(f"no data for {name} under {d}")
            from PIL import Image

            files = sorted(
                p for p in img_dir.rglob("*")
                if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp")
            )
            if not files:
                raise FileNotFoundError(f"no images under {d}")
            images = np.stack(
                [np.asarray(Image.open(f).convert("RGB")) for f in files]
            )
    crop = _DATASET_CROPS.get(name.split("_")[0])
    return _central_crop_resize(images, crop, config.data.image_size)


def _synthetic_images(config, n: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-image corpus (smooth random Fourier textures)."""
    rng = np.random.default_rng(seed)
    s = config.data.image_size
    c = config.data.num_channels
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    imgs = np.zeros((n, s, s, c), dtype=np.float32)
    for k in range(4):
        fx = rng.normal(size=(n, 1, 1, c)) * (k + 1) * 2 * np.pi / s
        fy = rng.normal(size=(n, 1, 1, c)) * (k + 1) * 2 * np.pi / s
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, c))
        imgs += np.sin(fx * xx[None, :, :, None] + fy * yy[None, :, :, None] + phase)
    imgs = (imgs - imgs.min()) / (imgs.max() - imgs.min() + 1e-9)
    return (imgs * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# iterator
# ---------------------------------------------------------------------------


class _Prefetcher:
    """Single-slot background prefetch of numpy batches."""

    def __init__(self, gen_fn):
        self._gen = gen_fn
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            self._q.put(self._gen())

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()


class ArrayDataset:
    """Shuffled epoch iterator over an in-memory array corpus."""

    def __init__(
        self,
        images: np.ndarray,
        batch_dims: tuple[int, ...],
        *,
        seed: int = 0,
        random_flip: bool = False,
        uniform_dequantization: bool = False,
        evaluation: bool = False,
        prefetch: bool = True,
    ):
        self.images = images
        self.batch_dims = tuple(batch_dims)
        self.flat = int(np.prod(self.batch_dims))
        self.rng = np.random.default_rng(seed)
        self.random_flip = random_flip and not evaluation
        self.uniform_dequantization = uniform_dequantization
        self.evaluation = evaluation
        self._perm = None
        self._pos = 0
        self._iter = _Prefetcher(self._make_batch) if prefetch else None

    def _next_indices(self):
        n = len(self.images)
        if self._perm is None or self._pos + self.flat > n:
            self._perm = self.rng.permutation(n)
            self._pos = 0
        idx = self._perm[self._pos : self._pos + self.flat]
        self._pos += self.flat
        return idx

    def _make_batch(self):
        idx = self._next_indices()
        imgs = self.images[idx]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        else:
            imgs = imgs.astype(np.float32)
        if self.random_flip:
            flip = self.rng.random(len(imgs)) < 0.5
            imgs[flip] = imgs[flip, :, ::-1]
        if self.uniform_dequantization:
            imgs = (
                self.rng.uniform(size=imgs.shape).astype(np.float32)
                + imgs * 255.0
            ) / 256.0
        return {"image": imgs.reshape(self.batch_dims + imgs.shape[1:])}

    def __iter__(self):
        return self

    def __next__(self):
        if self._iter is not None:
            return next(self._iter)
        return self._make_batch()


def get_dataset(config, additional_dim=None, uniform_dequantization=False,
                evaluation=False):
    """Build (train_iter, eval_iter) with reference-compatible batch layout.

    additional_dim: n_jitted_steps (prepended batch axis) or None
    (reference :73-105). Batches are per-host; shard over the mesh downstream.
    """
    batch_size = (
        config.training.batch_size if not evaluation else config.eval.batch_size
    )
    try:
        import jax

        n_procs = jax.process_count()
    except Exception:
        n_procs = 1
    per_host = batch_size // n_procs
    batch_dims = (additional_dim, per_host) if additional_dim else (per_host,)

    name = config.data.dataset.lower()
    if "ps" in name:
        from gddim_tpu.data.pointset import olympic_generate_sample

        raw = olympic_generate_sample(128 * 100, noise=0.01)
        raw = (raw - raw.mean(0, keepdims=True)) / raw.std(0, keepdims=True)
        train = ArrayDataset(
            raw.astype(np.float32), batch_dims, seed=config.seed, evaluation=evaluation
        )
        eval_ds = ArrayDataset(
            raw.astype(np.float32), batch_dims, seed=config.seed + 1, evaluation=True
        )
        return train, eval_ds

    if config.data.get("synthetic", False) or not config.data.get("data_dir", ""):
        n = 4096 if not getattr(config.data, "is_partial", False) else 512
        images = _synthetic_images(config, n, seed=config.seed)
    else:
        images = _load_image_corpus(config, train=True)
        if getattr(config.data, "is_partial", False):
            images = images[: max(len(images) // 1000, 1)]  # reference :110-116

    train = ArrayDataset(
        images,
        batch_dims,
        seed=config.seed,
        random_flip=config.data.random_flip,
        uniform_dequantization=uniform_dequantization,
        evaluation=evaluation,
    )
    eval_images = images[: min(len(images), 10_000)]
    eval_ds = ArrayDataset(
        eval_images,
        batch_dims,
        seed=config.seed + 1,
        evaluation=True,
    )
    return train, eval_ds
