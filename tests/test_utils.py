"""Utility layer: image grids, metrics logger, config flattening, caching."""

import json

import numpy as np

from gddim_tpu.utils.images import make_grid, save_image, save_pointset
from gddim_tpu.utils.io import content_key, load_npz_cache, save_npz_cache
from gddim_tpu.utils.logging import MetricsLogger
from gddim_tpu.utils.tree import flatten_config


def test_make_grid_layout():
    imgs = np.zeros((5, 4, 4, 3), dtype=np.float32)
    imgs[0] = 1.0
    grid = make_grid(imgs, nrow=4, padding=1)
    # 2 rows x 4 cols of 4px tiles + padding
    assert grid.shape == (2 * 5 + 1, 4 * 5 + 1, 3)
    # first tile bright, elsewhere dark padding
    assert grid[1:5, 1:5].min() == 1.0
    assert grid[0].max() == 0.0


def test_save_image_and_pointset(tmp_path):
    from PIL import Image

    imgs = np.random.default_rng(0).random((4, 8, 8, 3)).astype(np.float32)
    p = tmp_path / "grid.png"
    save_image(imgs, p)
    assert Image.open(p).size[0] > 8
    save_pointset(np.random.default_rng(1).normal(size=(100, 2)), tmp_path / "ps.png")
    assert (tmp_path / "ps.png").exists()


def test_metrics_logger_jsonl(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log({"train/loss": 0.5}, step=10)
    m.log({"eval/loss": np.float32(0.25)}, step=20)
    m.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["train/loss"] == 0.5 and lines[0]["step"] == 10
    assert lines[1]["eval/loss"] == 0.25


def test_flatten_config():
    from gddim_tpu.configs import get_config

    flat = flatten_config(get_config("cld/accr_dcifar10"))
    assert flat["model.nf"] == 128
    assert flat["sampling.method"] == "deis"
    assert flat["optim.lr"] == 2e-4


def test_content_addressed_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("GDDIM_CACHE_DIR", str(tmp_path))
    key = content_key("a", 1.5, np.arange(3))
    assert key == content_key("a", 1.5, np.arange(3))
    assert key != content_key("a", 1.5, np.arange(4))
    assert load_npz_cache("t", key) is None
    save_npz_cache("t", key, x=np.ones(2))
    out = load_npz_cache("t", key)
    np.testing.assert_allclose(out["x"], 1.0)
