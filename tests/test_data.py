"""Data pipelines: layouts, scalers, dequantization, corpus loaders, splits."""

import numpy as np
import pytest

from gddim_tpu.configs import get_config
from gddim_tpu.data import (
    get_data_inverse_scaler,
    get_data_scaler,
    get_data_shape,
    get_dataset,
    load_tfrecord_images,
    olympic_generate_sample,
    preprocess_corpus,
    write_tfrecord_images,
)
from gddim_tpu.data.pipelines import (
    ArrayDataset,
    _central_crop,
    _crop_resize,
    _resize_small,
)


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


def test_finite_epoch_raises_stop_iteration():
    """evaluation fixes one epoch (reference datasets.py:96), remainder dropped
    (drop_remainder=True, reference :207)."""
    images = np.arange(25, dtype=np.uint8).reshape(25, 1, 1, 1)
    for prefetch in (False, True):
        ds = ArrayDataset(images, (10,), prefetch=prefetch, num_epochs=1)
        batches = list(ds)
        assert len(batches) == 2  # 25 // 10, remainder dropped
        ds2 = ArrayDataset(images, (10,), prefetch=prefetch, num_epochs=3)
        assert len(list(ds2)) == 6


def test_eval_split_is_held_out(tmp_path):
    """Eval data comes from the held-out test corpus (reference :107-110)."""
    cfg = get_config("cld/simple_cifar10")
    cfg.data.synthetic = False
    cfg.data.data_dir = str(tmp_path)
    cfg.training.batch_size = 8
    cfg.eval.batch_size = 8
    train_imgs = np.zeros((64, 32, 32, 3), dtype=np.uint8)  # all-black train
    test_imgs = np.full((32, 32, 32, 3), 255, dtype=np.uint8)  # all-white test
    np.savez(tmp_path / "cifar10_train.npz", images=train_imgs)
    np.savez(tmp_path / "cifar10_test.npz", images=test_imgs)
    train, eval_ds = get_dataset(cfg)
    assert next(train)["image"].max() == 0.0
    assert next(eval_ds)["image"].min() == 1.0


def test_eval_split_holdout_fallback(tmp_path):
    """Without a test corpus, a trailing slice of train is held out; the two
    splits stay disjoint."""
    cfg = get_config("cld/simple_cifar10")
    cfg.data.synthetic = False
    cfg.data.data_dir = str(tmp_path)
    cfg.training.batch_size = 4
    cfg.eval.batch_size = 4
    # image i has constant value i
    imgs = np.arange(100, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 32, 32, 3), dtype=np.uint8
    )
    np.savez(tmp_path / "cifar10_train.npz", images=imgs)
    train, eval_ds = get_dataset(cfg)
    train_vals = set()
    for _ in range(40):
        train_vals.update(
            np.round(next(train)["image"][:, 0, 0, 0] * 255).astype(int).tolist()
        )
    eval_vals = set()
    for _ in range(5):
        eval_vals.update(
            np.round(next(eval_ds)["image"][:, 0, 0, 0] * 255).astype(int).tolist()
        )
    assert train_vals and eval_vals
    assert train_vals.isdisjoint(eval_vals)
    assert eval_vals == set(range(90, 100))  # trailing 10%


def test_lsun_preprocessing_pipelines():
    """LSUN@128 uses resize_small THEN central_crop with no uint8
    requantization; other sizes use crop_resize which casts back to uint8
    before the dtype conversion (reference :143-154)."""
    img = np.tile(
        np.linspace(0, 255, 400, dtype=np.float32)[:, None, None], (1, 100, 3)
    ).astype(np.uint8)[None]
    out = preprocess_corpus("lsun", img, 128)
    assert out.shape == (1, 128, 128, 3)
    # center square of the tall image: rows 150:250 of 400 -> top at ~0.375
    assert abs(out[0, 0, 0, 0] - 0.375) < 0.03
    # @128 branch keeps float precision: values off the 1/255 grid survive
    frac = np.abs(out * 255 - np.round(out * 255))
    assert frac.max() > 1e-3
    out64 = preprocess_corpus("lsun", img, 64)
    assert out64.shape == (1, 64, 64, 3)
    assert abs(out64[0, 0, 0, 0] - 0.375) < 0.04
    # crop_resize branch quantizes through uint8 (reference :151-154)
    np.testing.assert_allclose(out64 * 255, np.round(out64 * 255), atol=1e-5)


def test_resize_small_and_central_crop_shapes():
    imgs = (np.random.default_rng(0).random((2, 37, 61, 3)) * 255).astype(np.uint8)
    small = _resize_small(imgs, 16)
    assert min(small.shape[1], small.shape[2]) == 16
    assert small.shape[2] > small.shape[1]  # aspect preserved
    cropped = _central_crop(small, 16)
    assert cropped.shape[1:3] == (16, 16)
    sq = _crop_resize(imgs, 16)
    assert sq.shape == (2, 16, 16, 3) and sq.dtype == np.uint8


def test_celeba_crop_then_resize():
    imgs = np.zeros((2, 218, 178, 3), dtype=np.uint8)
    top, left = (218 - 140) // 2, (178 - 140) // 2
    imgs[:, top : top + 140, left : left + 140] = 255  # bright 140-crop region
    out = preprocess_corpus("celeba", imgs, 64)
    assert out.shape == (2, 64, 64, 3)
    assert out.mean() > 0.95  # crop captured only the bright center


def test_tfrecord_roundtrip(tmp_path):
    """FFHQ/CelebAHQ interchange: CHW-raw Example records (reference
    datasets.py:156-178), written and parsed without tensorflow."""
    rng = np.random.default_rng(0)
    imgs = (rng.random((5, 8, 8, 3)) * 255).astype(np.uint8)
    path = tmp_path / "ffhq.tfrecords"
    write_tfrecord_images(path, imgs)
    back = load_tfrecord_images(path)
    np.testing.assert_array_equal(back, imgs)
    assert load_tfrecord_images(path, limit=2).shape == (2, 8, 8, 3)


def test_ffhq_dataset_from_tfrecords(tmp_path):
    cfg = get_config("cld/simple_cifar10")
    cfg.data.dataset = "FFHQ"
    cfg.data.synthetic = False
    cfg.data.data_dir = str(tmp_path)
    cfg.data.image_size = 8
    cfg.data.tfrecords_path = str(tmp_path / "ffhq.tfrecords")
    cfg.training.batch_size = 4
    imgs = (np.random.default_rng(1).random((16, 8, 8, 3)) * 255).astype(np.uint8)
    write_tfrecord_images(cfg.data.tfrecords_path, imgs)
    train, eval_ds = get_dataset(cfg)
    b = next(train)["image"]
    assert b.shape == (4, 8, 8, 3)
    assert 0.0 <= b.min() and b.max() <= 1.0


def test_npz_corpus_loader(tmp_path):
    cfg = get_config("cld/ddpmpp_celeba")
    cfg.data.image_size = 16
    cfg.data.data_dir = str(tmp_path)
    imgs = (np.random.default_rng(0).random((32, 178, 218, 3)) * 255).astype(np.uint8)
    np.savez(tmp_path / "celeba_train.npz", images=imgs)
    cfg.data.synthetic = False
    cfg.training.batch_size = 8
    cfg.eval.batch_size = 8
    train, _ = get_dataset(cfg, additional_dim=None)
    b = next(train)["image"]
    assert b.shape == (8, 16, 16, 3)


def test_prefetcher_stays_exhausted():
    """A finished finite iterator keeps raising StopIteration instead of
    blocking on the empty queue (review finding)."""
    images = np.arange(20, dtype=np.uint8).reshape(20, 1, 1, 1)
    ds = ArrayDataset(images, (10,), prefetch=True, num_epochs=1)
    assert len(list(ds)) == 2
    for _ in range(3):
        try:
            next(ds)
            assert False, "expected StopIteration"
        except StopIteration:
            pass


def test_celeba_presized_and_undersized_corpora():
    imgs64 = (np.random.default_rng(0).random((4, 64, 64, 3)) * 255).astype(np.uint8)
    out = preprocess_corpus("celeba", imgs64, 64)
    assert out.shape == (4, 64, 64, 3)  # pre-sized corpus passes through
    with pytest.raises(ValueError):
        preprocess_corpus("celeba", imgs64, 32)  # smaller than the 140 crop
