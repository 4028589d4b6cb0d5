"""Data pipelines: layouts, scalers, dequantization, corpus loaders."""

import numpy as np
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.data import (
    get_data_inverse_scaler,
    get_data_scaler,
    get_data_shape,
    get_dataset,
    olympic_generate_sample,
)
from gddim_tpu.data.pipelines import ArrayDataset, _central_crop_resize


def test_scalers_roundtrip():
    cfg = get_config("cld/accr_dcifar10")  # centered=True
    s, inv = get_data_scaler(cfg), get_data_inverse_scaler(cfg)
    x = np.linspace(0, 1, 11)
    np.testing.assert_allclose(inv(s(x)), x)
    np.testing.assert_allclose(s(np.array([0.0, 1.0])), [-1.0, 1.0])
    cfg.data.centered = False
    assert get_data_scaler(cfg)(x) is x or np.allclose(get_data_scaler(cfg)(x), x)


def test_batch_layout_with_scan_axis():
    cfg = get_config("cld/simple_cifar10")
    cfg.training.batch_size = 8
    train, _ = get_dataset(cfg, additional_dim=3)
    batch = next(train)
    assert batch["image"].shape == (3, 8, 32, 32, 3)
    assert batch["image"].dtype == np.float32
    assert 0.0 <= batch["image"].min() and batch["image"].max() <= 1.0


def test_pointset_dataset_stats():
    pts = olympic_generate_sample(1000, noise=0.01, rng=np.random.default_rng(0))
    assert pts.shape == (1000, 2)
    # five clusters roughly centered per the olympic layout
    assert np.abs(pts.mean(0)).max() < 0.5

    cfg = get_config("cld/points")
    cfg.training.batch_size = 64
    train, _ = get_dataset(cfg, additional_dim=2)
    b = next(train)["image"]
    assert b.shape == (2, 64, 2)
    # normalized corpus
    assert abs(float(b.mean())) < 0.3


def test_uniform_dequantization():
    images = np.full((64, 4, 4, 1), 128, dtype=np.uint8)
    ds = ArrayDataset(
        images, (32,), uniform_dequantization=True, prefetch=False
    )
    b = next(ds)["image"]
    # dequantized values fill (128/256, 129/256)
    assert b.min() >= 128 / 256 and b.max() <= 129 / 256
    assert b.std() > 0


def test_random_flip():
    rng = np.random.default_rng(0)
    images = (rng.random((256, 4, 4, 1)) * 255).astype(np.uint8)
    images[:, :, 0] = 255  # left column marker
    images[:, :, -1] = 0
    ds = ArrayDataset(images, (256,), random_flip=True, prefetch=False, seed=1)
    b = next(ds)["image"]
    left = (b[:, :, 0] > 0.9).all(axis=(1, 2))
    assert 0.2 < left.mean() < 0.8  # about half flipped


def test_epoch_covers_corpus_without_replacement():
    images = np.arange(100, dtype=np.uint8).reshape(100, 1, 1, 1)
    ds = ArrayDataset(images, (10,), prefetch=False, seed=0)
    seen = []
    for _ in range(10):
        seen.extend((next(ds)["image"] * 255).astype(int).ravel().tolist())
    assert sorted(seen) == list(range(100))


def test_central_crop_resize():
    imgs = np.zeros((2, 178, 218, 3), dtype=np.uint8)
    imgs[:, 19 : 19 + 140, 39 : 39 + 140] = 255  # center block
    out = _central_crop_resize(imgs, 140, 64)
    assert out.shape == (2, 64, 64, 3)
    assert out.mean() > 200  # crop focused on the bright center


def test_npz_corpus_loader(tmp_path):
    cfg = get_config("cld/ddpmpp_celeba")
    cfg.data.image_size = 16
    cfg.data.data_dir = str(tmp_path)
    imgs = (np.random.default_rng(0).random((32, 140, 140, 3)) * 255).astype(np.uint8)
    np.savez(tmp_path / "celeba_train.npz", images=imgs)
    cfg.data.synthetic = False
    cfg.training.batch_size = 8
    train, _ = get_dataset(cfg, additional_dim=None)
    b = next(train)["image"]
    assert b.shape == (8, 16, 16, 3)
