"""Input pipelines (numpy/threaded; no tf.data dependency).

Replaces the reference's tfds pipelines (cld_jax/datasets.py) with host-side
numpy iterators that emit the same batch layout the jitted train step scans
over: leaves shaped [n_jitted_steps, per_host_batch, ...] (the reference's
[local_devices, n_jitted_steps, per_device_batch] minus the pmap axis — the
mesh sharding handles devices). Parity points:

- train/eval corpora follow the reference's split choice (datasets.py:107-141):
  the held-out 'test' split for CIFAR10/SVHN and 'validation' for
  CelebA/LSUN — eval data is disjoint from training data. When no held-out
  corpus exists locally, the trailing 10% of the train corpus is carved out
  instead (still disjoint; logged).
- per-dataset preprocessing matches the reference ops (datasets.py:43-70,
  112-154): antialiased resize (CIFAR10/SVHN), central-crop-140-then-resize
  (CelebA), resize-small-then-central-crop (LSUN@128),
  square-crop-then-bicubic-resize (other LSUN sizes), raw CHW TFRecords
  (FFHQ/CelebAHQ — parsed by a dependency-free TFRecord/Example reader).
- `evaluation=True` fixes both iterators to ONE epoch (reference :96), raising
  StopIteration at the end; training iterators repeat forever.
- uniform dequantization and random flips (reference :163-190);
- [0,1] <-> [-1,1] scalers (reference :25-40);
- multi-process runs shard the corpus across hosts (images[pidx::nproc]),
  the mesh-native equivalent of tfds per-host file sharding.

A background thread prefetches the next batch while the device computes.
"""

from __future__ import annotations

import logging
import os
import pickle
import queue
import struct
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("gddim_tpu")


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
# resize ops (PIL-backed; match reference tf.image semantics, datasets.py:43-70)
# ---------------------------------------------------------------------------


def _pil_resize(images: np.ndarray, h: int, w: int, method: str) -> np.ndarray:
    """Antialiased convolution resize per image (PIL implements the same
    filter-scaled resampling tf.image.resize(antialias=True) does)."""
    from PIL import Image

    filt = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}[method]
    n, _, _, c = images.shape
    out = np.empty((n, h, w, c), dtype=np.float32)
    for i in range(n):
        for ch in range(c):
            plane = Image.fromarray(images[i, :, :, ch].astype(np.float32), mode="F")
            out[i, :, :, ch] = np.asarray(plane.resize((w, h), filt))
    return out


def _central_crop(images: np.ndarray, size: int) -> np.ndarray:
    """Center crop to (size, size) (reference central_crop, :66-70)."""
    h, w = images.shape[1], images.shape[2]
    top, left = (h - size) // 2, (w - size) // 2
    return images[:, top : top + size, left : left + size]


def _crop_resize(images: np.ndarray, resolution: int) -> np.ndarray:
    """Square center crop to min(h,w) then BICUBIC resize, uint8 out
    (reference crop_resize, :43-54)."""
    h, w = images.shape[1], images.shape[2]
    crop = min(h, w)
    imgs = _central_crop(images, crop)
    out = _pil_resize(imgs.astype(np.float32), resolution, resolution, "bicubic")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _resize_small(images: np.ndarray, resolution: int) -> np.ndarray:
    """Shrink so the SHORT side equals `resolution`, antialiased
    (reference resize_small, :57-63). float32 out, same scale as input."""
    h, w = images.shape[1], images.shape[2]
    ratio = resolution / min(h, w)
    nh, nw = int(round(h * ratio)), int(round(w * ratio))
    return _pil_resize(images.astype(np.float32), nh, nw, "bilinear")


def preprocess_corpus(name: str, images: np.ndarray, size: int) -> np.ndarray:
    """Per-dataset resize pipeline, dispatching exactly as the reference does
    (datasets.py:107-154). Returns float32 images in [0,1]."""
    name = name.lower().split("_")[0].split("/")[0]
    if name in ("cifar10", "svhn"):
        imgs = images.astype(np.float32) / (255.0 if images.dtype == np.uint8 else 1.0)
        if imgs.shape[1] != size or imgs.shape[2] != size:
            imgs = _pil_resize(imgs, size, size, "bilinear")
        return np.clip(imgs, 0.0, 1.0)
    if name == "celeba":
        h_in, w_in = images.shape[1], images.shape[2]
        if h_in == size and w_in == size:
            # corpus already preprocessed to the target resolution
            imgs = images.astype(np.float32) / (
                255.0 if images.dtype == np.uint8 else 1.0
            )
            return np.clip(imgs, 0.0, 1.0)
        if h_in < 140 or w_in < 140:
            raise ValueError(
                f"celeba corpus images are {h_in}x{w_in}; the reference "
                "pipeline center-crops 140x140 (datasets.py:131-136)"
            )
        # central_crop(140) THEN antialiased resize (reference :131-136)
        imgs = _central_crop(images, 140).astype(np.float32)
        imgs = imgs / (255.0 if images.dtype == np.uint8 else 1.0)
        if imgs.shape[1] != size:
            imgs = np.clip(_pil_resize(imgs, size, size, "bilinear"), 0.0, 1.0)
        return imgs
    if name == "lsun":
        if size == 128:
            # resize_small THEN central_crop (reference :143-148) — the order
            # matters: short-side shrink first preserves aspect, crop second
            imgs = _resize_small(images, size)
            imgs = _central_crop(imgs, size)
            scale = 255.0 if images.dtype == np.uint8 else 1.0
            return np.clip(imgs / scale, 0.0, 1.0)
        # other resolutions: square crop then bicubic, cast back to uint8
        # BEFORE the dtype conversion (reference :151-154)
        imgs = _crop_resize(images, size)
        return imgs.astype(np.float32) / 255.0
    if name in ("ffhq", "celebahq"):
        # TFRecords store already-sized images; no resize op (reference :165-178)
        return images.astype(np.float32) / (255.0 if images.dtype == np.uint8 else 1.0)
    # default: plain antialiased resize
    imgs = images.astype(np.float32) / (255.0 if images.dtype == np.uint8 else 1.0)
    if imgs.shape[1] != size or imgs.shape[2] != size:
        imgs = np.clip(_pil_resize(imgs, size, size, "bilinear"), 0.0, 1.0)
    return imgs


# ---------------------------------------------------------------------------
# TFRecord / tf.train.Example reader (dependency-free)
# ---------------------------------------------------------------------------
#
# FFHQ/CelebAHQ ship as TFRecords of tf.train.Example protos with features
# {'shape': int64[3], 'data': bytes} holding raw CHW uint8 pixels
# (reference datasets.py:156-178). The wire formats are simple enough to
# parse without tensorflow: TFRecord frames are
# [len:u64le][crc(len):u32][payload][crc(payload):u32], and the Example proto
# is nested length-delimited protobuf messages.


def iter_tfrecords(path: str | Path):
    """Yield raw record payloads from a TFRecord file (CRCs skipped)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            payload = f.read(length)
            f.read(4)  # payload crc
            yield payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_proto_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message body."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def parse_example(payload: bytes) -> dict:
    """Parse a tf.train.Example into {name: bytes | list[int] | list[float]}."""
    out = {}
    for f_ex, _, features_buf in _iter_proto_fields(payload):
        if f_ex != 1:  # Example.features
            continue
        for f_fs, _, entry in _iter_proto_fields(features_buf):
            if f_fs != 1:  # Features.feature map entry
                continue
            key, feature = None, b""
            for f_kv, _, v in _iter_proto_fields(entry):
                if f_kv == 1:
                    key = v.decode()
                elif f_kv == 2:
                    feature = v
            for f_kind, _, kind_buf in _iter_proto_fields(feature):
                if f_kind == 1:  # BytesList
                    for f_b, _, b in _iter_proto_fields(kind_buf):
                        if f_b == 1:
                            out[key] = b
                elif f_kind == 3:  # Int64List (packed varints)
                    vals, pos = [], 0
                    for _, wire, v in _iter_proto_fields(kind_buf):
                        if wire == 0:
                            vals.append(v)
                        elif wire == 2:  # packed
                            p = 0
                            while p < len(v):
                                x, p = _read_varint(v, p)
                                vals.append(x)
                    out[key] = vals
    return out


def load_tfrecord_images(path: str | Path, limit: int | None = None) -> np.ndarray:
    """Decode the reference's FFHQ/CelebAHQ records: raw CHW uint8 -> NHWC
    (reference datasets.py:166-172: decode_raw -> reshape(shape) ->
    transpose(1,2,0))."""
    images = []
    for payload in iter_tfrecords(path):
        ex = parse_example(payload)
        shape = [int(s) for s in ex["shape"]]
        data = np.frombuffer(ex["data"], dtype=np.uint8).reshape(shape)
        images.append(data.transpose(1, 2, 0))
        if limit is not None and len(images) >= limit:
            break
    if not images:
        raise ValueError(f"no records in {path}")
    return np.stack(images)


def write_tfrecord_images(path: str | Path, images: np.ndarray):
    """Write NHWC uint8 images in the reference's TFRecord layout (for
    interchange and tests; CRC fields zeroed — readers here skip them)."""

    def varint(n: int) -> bytes:
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def ld(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    with open(path, "wb") as f:
        for img in images:
            chw = np.ascontiguousarray(img.transpose(2, 0, 1))
            shape_list = b"".join(varint(s) for s in chw.shape)
            feat_shape = ld(3, ld(1, shape_list))  # Feature.int64_list packed
            feat_data = ld(1, ld(1, chw.tobytes()))  # Feature.bytes_list
            features = ld(1, ld(1, ld(1, b"shape") + ld(2, feat_shape))) + ld(
                1, ld(1, ld(1, b"data") + ld(2, feat_data))
            )
            payload = features  # Example.features is field 1, already wrapped
            f.write(struct.pack("<Q", len(payload)) + b"\0" * 4)
            f.write(payload + b"\0" * 4)


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


def _find_corpus(config, train: bool) -> np.ndarray | None:
    """Locate a raw (unpreprocessed) corpus for the requested split, or None.

    The split names follow the reference (datasets.py:107-158): held-out
    'test' for CIFAR10/SVHN, 'validation' for CelebA/LSUN, and train==eval
    for the TFRecord datasets (FFHQ/CelebAHQ use the same records for both,
    reference :158).
    """
    name = config.data.dataset.lower()
    d = Path(config.data.data_dir)
    if name == "cifar10" and (
        (d / "cifar-10-batches-py").exists() or (d / "data_batch_1").exists()
        or (d / ("cifar10_train.npz" if train else "cifar10_test.npz")).exists()
    ):
        try:
            return _load_cifar10_dir(config.data.data_dir, train)
        except FileNotFoundError:
            return None
    if name in ("ffhq", "celebahq"):
        rec = str(getattr(config.data, "tfrecords_path", "") or "")
        if rec and Path(rec).exists():
            return load_tfrecord_images(rec)
        return None
    split_names = (
        ["train"] if train else
        (["validation", "val", "test"] if name.split("_")[0] in ("celeba", "lsun")
         else ["test", "validation", "val"])
    )
    for split in split_names + (["train"] if train else []):
        npz = d / f"{name}_{split}.npz"
        if npz.exists():
            with np.load(npz) as z:
                return z["images"]
    if train:
        npz = d / f"{name}.npz"
        if npz.exists():
            with np.load(npz) as z:
                return z["images"]
        if d.is_dir():
            from PIL import Image

            files = sorted(
                p for p in d.rglob("*")
                if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp")
            )
            if files:
                return np.stack(
                    [np.asarray(Image.open(f).convert("RGB")) for f in files]
                )
    return None


def _synthetic_images(config, n: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-image corpus (smooth random Fourier textures)."""
    rng = np.random.default_rng(seed)
    s = config.data.image_size
    c = config.data.num_channels
    yy, xx = np.meshgrid(
        np.arange(s, dtype=np.float32), np.arange(s, dtype=np.float32),
        indexing="ij",
    )
    imgs = np.zeros((n, s, s, c), dtype=np.float32)
    for k in range(4):
        scale = np.float32((k + 1) * 2 * np.pi / s)
        fx = rng.normal(size=(n, 1, 1, c)).astype(np.float32) * scale
        fy = rng.normal(size=(n, 1, 1, c)).astype(np.float32) * scale
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, c)).astype(np.float32)
        arg = fx * xx[None, :, :, None]
        arg += fy * yy[None, :, :, None]
        arg += phase
        imgs += np.sin(arg, out=arg)
    imgs -= imgs.min()
    imgs /= imgs.max() + 1e-9
    return (imgs * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# iterator
# ---------------------------------------------------------------------------


_STOP = object()


class _Prefetcher:
    """Single-slot background prefetch of numpy batches."""

    def __init__(self, gen_fn):
        self._gen = gen_fn
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            try:
                self._q.put(self._gen())
            except StopIteration:
                self._q.put(_STOP)
                return

    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, "_done", False):
            raise StopIteration
        item = self._q.get()
        if item is _STOP:
            self._done = True
            raise StopIteration
        return item


class ArrayDataset:
    """Shuffled iterator over an in-memory float/uint8 corpus.

    num_epochs=None repeats forever (training); a finite count raises
    StopIteration after that many full shuffled passes (reference
    datasets.py:96: `num_epochs = None if not evaluation else 1`). Remainder
    batches are dropped, matching `drop_remainder=True` (reference :207).
    """

    def __init__(
        self,
        images: np.ndarray,
        batch_dims: tuple[int, ...],
        *,
        seed: int = 0,
        random_flip: bool = False,
        uniform_dequantization: bool = False,
        evaluation: bool = False,
        num_epochs: int | None = None,
        prefetch: bool = True,
    ):
        self.images = images
        self.batch_dims = tuple(batch_dims)
        self.flat = int(np.prod(self.batch_dims))
        if self.flat > len(images):
            raise ValueError(
                f"batch of {self.flat} exceeds corpus of {len(images)}"
            )
        self.rng = np.random.default_rng(seed)
        self.random_flip = random_flip and not evaluation
        self.uniform_dequantization = uniform_dequantization
        self.evaluation = evaluation
        self.num_epochs = num_epochs
        self._epochs_done = 0
        self._perm = None
        self._pos = 0
        self._iter = _Prefetcher(self._make_batch) if prefetch else None

    def _next_indices(self):
        n = len(self.images)
        if self._perm is None or self._pos + self.flat > n:
            if self._perm is not None:
                self._epochs_done += 1
            if self.num_epochs is not None and self._epochs_done >= self.num_epochs:
                raise StopIteration
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


def _process_shard(images: np.ndarray, pidx: int, nproc: int) -> np.ndarray:
    """Each host reads a disjoint slice of the corpus (mesh-native stand-in
    for tfds per-host file sharding)."""
    if nproc <= 1:
        return images
    return images[pidx::nproc]


def get_dataset(config, additional_dim=None, uniform_dequantization=False,
                evaluation=False):
    """Build (train_iter, eval_iter) with reference-compatible batch layout.

    additional_dim: n_jitted_steps (prepended batch axis) or None
    (reference :73-105). Batches are per-host; shard over the mesh downstream.
    evaluation=True fixes both iterators to one epoch (reference :96).
    """
    batch_size = (
        config.training.batch_size if not evaluation else config.eval.batch_size
    )
    try:
        import jax

        n_procs = jax.process_count()
        pidx = jax.process_index()
    except Exception:
        n_procs, pidx = 1, 0
    per_host = batch_size // n_procs
    batch_dims = (additional_dim, per_host) if additional_dim else (per_host,)
    num_epochs = 1 if evaluation else None

    name = config.data.dataset.lower()
    if "ps" in name:
        from gddim_tpu.data.pointset import olympic_generate_sample

        raw = olympic_generate_sample(128 * 100, noise=0.01)
        raw = (raw - raw.mean(0, keepdims=True)) / raw.std(0, keepdims=True)
        raw = raw.astype(np.float32)
        train = ArrayDataset(
            _process_shard(raw, pidx, n_procs), batch_dims,
            seed=config.seed + pidx, evaluation=evaluation, num_epochs=num_epochs,
        )
        eval_ds = ArrayDataset(
            _process_shard(raw, pidx, n_procs), batch_dims,
            seed=config.seed + pidx + 1, evaluation=True, num_epochs=num_epochs,
        )
        return train, eval_ds

    if config.data.get("synthetic", False) or not config.data.get("data_dir", ""):
        n = 2048 if not getattr(config.data, "is_partial", False) else 512
        flat = per_host * (additional_dim or 1) * n_procs
        n = max(n, flat)
        train_images = _synthetic_images(config, n, seed=config.seed)
        # disjoint eval stream: different Fourier draw (seed offset)
        eval_images = _synthetic_images(
            config, max(n // 2, flat), seed=config.seed + 7919
        )  # flat is already n_procs-aware
    else:
        size = config.data.image_size
        train_images = _find_corpus(config, train=True)
        if train_images is None:
            raise FileNotFoundError(
                f"no data for {name} under {config.data.data_dir}"
            )
        if name in ("ffhq", "celebahq"):
            # reference uses the same records for both splits (:158) — and
            # looking up a separate eval corpus would re-decode the whole
            # TFRecord file just to throw it away
            eval_images = train_images
        elif (eval_images := _find_corpus(config, train=False)) is None:
            # no held-out corpus available: carve the trailing 10% (<=10k) out
            # of train so eval stays disjoint (stricter than the round-1
            # behavior of evaluating on a train prefix)
            # sizes must survive the per-process sharding below: each host
            # keeps ~1/n_procs of the corpus and needs a full batch
            flat = per_host * (additional_dim or 1) * n_procs
            n_eval = min(max(len(train_images) // 10, 1), 10_000)
            if len(train_images) - n_eval >= flat and n_eval >= flat:
                logger.warning(
                    "no held-out %s corpus; holding out trailing %d train "
                    "images for eval", name, n_eval,
                )
                eval_images = train_images[-n_eval:]
                train_images = train_images[:-n_eval]
            else:  # corpus too small to split; fall back (tests/smoke runs)
                logger.warning(
                    "corpus too small to hold out an eval split; eval reuses "
                    "train images"
                )
                eval_images = train_images
        shared = eval_images is train_images  # ffhq/celebahq reuse the corpus
        train_images = preprocess_corpus(name, train_images, size)
        eval_images = (
            train_images if shared else preprocess_corpus(name, eval_images, size)
        )
        if getattr(config.data, "is_partial", False):
            train_images = train_images[: max(len(train_images) // 1000, 1)]  # reference :110-116

    train = ArrayDataset(
        _process_shard(train_images, pidx, n_procs),
        batch_dims,
        seed=config.seed + pidx,
        random_flip=config.data.random_flip,
        uniform_dequantization=uniform_dequantization,
        evaluation=evaluation,
        num_epochs=num_epochs,
    )
    eval_ds = ArrayDataset(
        _process_shard(eval_images, pidx, n_procs),
        batch_dims,
        seed=config.seed + pidx + 1,
        uniform_dequantization=uniform_dequantization,
        evaluation=True,
        num_epochs=num_epochs,
    )
    return train, eval_ds
