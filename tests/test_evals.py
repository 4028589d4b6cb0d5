"""FID/IS math + feature pipeline + InceptionV3 port structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gddim_tpu.evals import (
    activation_stats,
    frechet_distance,
    get_feature_extractor,
    inception_score,
    load_dataset_stats,
    run_features_sharded,
)
from gddim_tpu.evals.fid import save_dataset_stats


def test_frechet_distance_identities(rng):
    mu = rng.normal(size=16)
    a = rng.normal(size=(16, 16))
    sigma = a @ a.T + np.eye(16)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    # known closed form for isotropic Gaussians:
    # FID(N(0, I), N(m, s^2 I)) = |m|^2 + d*(1-s)^2
    d = 16
    m = np.full(d, 0.5)
    s = 2.0
    fid = frechet_distance(np.zeros(d), np.eye(d), m, s**2 * np.eye(d))
    np.testing.assert_allclose(fid, d * 0.25 + d * (1 - s) ** 2, rtol=1e-8)
    # symmetric
    np.testing.assert_allclose(
        frechet_distance(np.zeros(d), np.eye(d), m, 4 * np.eye(d)),
        frechet_distance(m, 4 * np.eye(d), np.zeros(d), np.eye(d)),
        rtol=1e-8,
    )


def test_frechet_distance_sample_estimate(rng):
    x = rng.normal(size=(20000, 8))
    y = rng.normal(size=(20000, 8)) + 1.0
    mu1, s1 = activation_stats(x)
    mu2, s2 = activation_stats(y)
    fid = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(fid, 8.0, rtol=0.05)  # |mean diff|^2 = 8


def test_inception_score_bounds(rng):
    # uniform logits -> IS = 1
    logits = np.zeros((100, 10))
    np.testing.assert_allclose(inception_score(logits), 1.0, rtol=1e-6)
    # perfectly confident + uniform marginal -> IS = num classes
    logits = np.eye(10)[np.arange(100) % 10] * 50
    np.testing.assert_allclose(inception_score(logits), 10.0, rtol=1e-3)


def test_stats_roundtrip(tmp_path, rng):
    mu, sigma = activation_stats(rng.normal(size=(100, 4)))
    p = tmp_path / "stats.npz"
    save_dataset_stats(p, mu, sigma)
    mu2, sigma2 = load_dataset_stats(p)
    np.testing.assert_allclose(mu, mu2)
    np.testing.assert_allclose(sigma, sigma2)


def test_proxy_extractor_discriminates(rng):
    """Proxy features must separate distinct image distributions."""
    import ml_collections

    cfg = ml_collections.ConfigDict()
    cfg.eval = dict(inception_weights="")
    cfg.data = dict(image_size=16, num_channels=3)
    ext = get_feature_extractor(cfg)
    a = (rng.random((128, 16, 16, 3)) * 255).astype(np.uint8)
    b = np.zeros((128, 16, 16, 3), dtype=np.uint8)
    pa, la = run_features_sharded(ext, a, batch_size=64)
    pb, lb = run_features_sharded(ext, b, batch_size=64)
    assert pa.shape == (128, ext.feature_dim)
    fid_ab = frechet_distance(*activation_stats(pa), *activation_stats(pb))
    a2 = (rng.random((128, 16, 16, 3)) * 255).astype(np.uint8)
    pa2, _ = run_features_sharded(ext, a2, batch_size=64)
    fid_aa = frechet_distance(*activation_stats(pa), *activation_stats(pa2))
    assert fid_ab > 10 * max(fid_aa, 1e-6)


def test_features_sharded_over_mesh(rng):
    from gddim_tpu.parallel import make_mesh

    import ml_collections

    cfg = ml_collections.ConfigDict()
    cfg.eval = dict(inception_weights="")
    cfg.data = dict(image_size=8, num_channels=3)
    ext = get_feature_extractor(cfg)
    imgs = (rng.random((100, 8, 8, 3)) * 255).astype(np.uint8)  # 100 % 8 != 0
    mesh = make_mesh()
    pools, logits = run_features_sharded(ext, imgs, batch_size=32, mesh=mesh)
    assert pools.shape[0] == 100
    # identical to unsharded
    pools1, _ = run_features_sharded(ext, imgs, batch_size=32)
    np.testing.assert_allclose(pools, pools1, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_inception_port_structure(tmp_path):
    """The InceptionV3 port accepts a torchvision-shaped state dict and emits
    2048-d pool features + 1000-d logits."""
    from gddim_tpu.evals.features import FeatureExtractor
    from gddim_tpu.evals.inception import InceptionV3, random_state_dict

    sd = random_state_dict()
    net = InceptionV3(sd)
    imgs = jnp.asarray(
        (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32)
    )
    out = net(imgs)
    assert out["pool_3"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1000)
    assert np.isfinite(np.asarray(out["pool_3"])).all()

    # loader path
    np.savez(tmp_path / "w.npz", **sd)
    from gddim_tpu.evals.inception import load_inception_extractor

    ext = load_inception_extractor(str(tmp_path / "w.npz"))
    assert isinstance(ext, FeatureExtractor)
    assert ext.feature_dim == 2048


def test_fid_stats_mode(tmp_path):
    """run_lib.fid_stats writes a loadable (mu, sigma) stats file."""
    from gddim_tpu import run_lib
    from gddim_tpu.configs import get_config

    cfg = get_config("cld/simple_cifar10")
    cfg.data.image_size = 8
    cfg.eval.num_samples = 64
    out = run_lib.fid_stats(cfg, out_path=str(tmp_path / "stats.npz"))
    mu, sigma = load_dataset_stats(out)
    assert mu.ndim == 1 and sigma.shape == (len(mu), len(mu))
    assert np.isfinite(mu).all() and np.isfinite(sigma).all()


def test_kernel_distance_properties(rng):
    """KID: unbiased ~0 for same-distribution, positive for shifted; block
    splitting handles >max_block_size sets (tfgan scheme)."""
    from gddim_tpu.evals import kernel_distance

    x = rng.normal(size=(1500, 8))
    y = rng.normal(size=(1500, 8))
    same = kernel_distance(x, y, max_block_size=1024)
    assert abs(same) < 0.05
    z = rng.normal(size=(1500, 8)) + 1.0
    far = kernel_distance(x, z, max_block_size=1024)
    assert far > 10 * abs(same)
    # deterministic given the seed
    assert kernel_distance(x, z) == kernel_distance(x, z)


def test_stats_file_with_pools_roundtrip(tmp_path, rng):
    """Stats files carrying raw pool_3 (the reference's format) load both ways."""
    pools = rng.normal(size=(64, 4))
    mu, sigma = activation_stats(pools)
    p = tmp_path / "stats_pools.npz"
    save_dataset_stats(p, mu, sigma, pools=pools)
    mu2, sigma2 = load_dataset_stats(p)
    np.testing.assert_allclose(mu, mu2)
    with np.load(p) as z:
        assert "pool_3" in z
    # tfgan-era file: pool_3 only
    p2 = tmp_path / "tfgan_style.npz"
    np.savez(p2, pool_3=pools)
    mu3, sigma3 = load_dataset_stats(p2)
    np.testing.assert_allclose(mu, mu3)
    np.testing.assert_allclose(sigma, sigma3)


def test_tf1_resize_bilinear_asymmetric():
    """TF1 align_corners=False samples at i*(in/out) — NOT half-pixel."""
    import jax.numpy as jnp
    from gddim_tpu.evals.inception import _tf1_resize_bilinear

    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1)
    x = jnp.tile(x, (1, 1, 4, 1))
    out = np.asarray(_tf1_resize_bilinear(x, 8))
    # rows sample at [0, .5, 1, 1.5, 2, 2.5, 3, 3.5] -> last row clamps to 3
    np.testing.assert_allclose(
        out[0, :, 0, 0], [0, 0.5, 1, 1.5, 2, 2.5, 3, 3], atol=1e-6
    )


@pytest.mark.slow
def test_inception_fid2015_structure(tmp_path):
    """The tfgan/2015 FID graph variant: 1008 logits, max-pool Mixed_7c,
    exclusive-pad avg pools; loader auto-detects the mode from the head."""
    import jax.numpy as jnp
    from gddim_tpu.evals.inception import (
        InceptionV3, load_inception_extractor, random_state_dict,
    )

    sd = random_state_dict(n_classes=1008)
    net = InceptionV3(sd, mode="fid2015")
    imgs = jnp.asarray(
        (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32)
    )
    out = net(imgs)
    assert out["pool_3"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1008)
    assert np.isfinite(np.asarray(out["pool_3"])).all()
    # differs from the torchvision graph on the same weights (pool semantics)
    out_tv = InceptionV3(sd, mode="torchvision")(imgs)
    assert np.abs(np.asarray(out["pool_3"]) - np.asarray(out_tv["pool_3"])).max() > 1e-4

    np.savez(tmp_path / "w2015.npz", **sd)
    ext = load_inception_extractor(str(tmp_path / "w2015.npz"))
    assert ext.name == "inception_fid2015"
    assert ext.logits_dim == 1008


def test_avgpool_exclusive_vs_inclusive():
    import jax.numpy as jnp
    from gddim_tpu.evals.inception import _avgpool3, _avgpool3_excl

    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    incl = np.asarray(_avgpool3(x))
    excl = np.asarray(_avgpool3_excl(x))
    assert incl[0, 0, 0, 0] == pytest.approx(4 / 9)  # zeros counted
    assert excl[0, 0, 0, 0] == pytest.approx(1.0)  # padding excluded
    assert excl[0, 1, 1, 0] == pytest.approx(1.0)


def test_kernel_distance_uneven_sets_stay_finite(rng):
    """KID with a small sample set vs a large reference pool must not produce
    NaN blocks (review finding: 0/1-element blocks in the smaller set)."""
    from gddim_tpu.evals import kernel_distance

    small = rng.normal(size=(64, 8))
    big = rng.normal(size=(3000, 8))
    kid = kernel_distance(small, big, max_block_size=64)
    assert np.isfinite(kid)
    kid2 = kernel_distance(rng.normal(size=(3, 8)), big, max_block_size=16)
    assert np.isfinite(kid2)


def test_tf1_resize_2d_golden():
    """Hand-derived 2-D fixture for the TF1 asymmetric bilinear resize.

    in=2, out=4: source coords i*(2/4) = [0, .5, 1, 1.5]; index pairs
    (0,1),(0,1),(1,1),(1,1) with fracs [0,.5,0,.5] (1.5 clamps to the last
    row). For [[1,2],[3,4]] the full 4x4 answer follows by hand. Pins the
    convention the tfgan inception module applies internally
    (reference cld_jax/evaluation.py:100-102); half-pixel sampling
    (jax.image.resize) would produce a different grid.
    """
    from gddim_tpu.evals.inception import _tf1_resize_bilinear

    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    out = np.asarray(_tf1_resize_bilinear(x, 4))[0, :, :, 0]
    expected = np.array(
        [
            [1.0, 1.5, 2.0, 2.0],
            [2.0, 2.5, 3.0, 3.0],
            [3.0, 3.5, 4.0, 4.0],
            [3.0, 3.5, 4.0, 4.0],
        ]
    )
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # and it must NOT match half-pixel sampling on the same input
    halfpix = np.asarray(
        jax.image.resize(x, (1, 4, 4, 1), "bilinear", antialias=False)
    )[0, :, :, 0]
    assert np.abs(halfpix - expected).max() > 0.2


def test_avgpool_excl_2d_golden():
    """Hand-derived fixture for the exclusive-pad 3x3 avg pool (the
    tfgan/2015 FID graph branch-pool semantics): on [[1..9]] each output is
    the mean of the in-bounds window only."""
    from gddim_tpu.evals.inception import _avgpool3, _avgpool3_excl

    x = jnp.arange(1.0, 10.0).reshape(1, 3, 3, 1)
    out = np.asarray(_avgpool3_excl(x))[0, :, :, 0]
    expected = np.array(
        [
            [3.0, 3.5, 4.0],
            [4.5, 5.0, 5.5],
            [6.0, 6.5, 7.0],
        ]
    )
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # inclusive (torchvision) semantics divide by 9 everywhere: corner 12/9
    incl = np.asarray(_avgpool3(x))[0, :, :, 0]
    np.testing.assert_allclose(incl[0, 0], 12.0 / 9.0, atol=1e-6)


# Frozen on the CPU backend (the pytest platform, tests/conftest.py); seed 7
# random weights + byte-gradient input. Regenerate ONLY on an intentional
# convention change: scripts in the test docstring below.
_FP2015 = {
    "pool_mean": 0.03290675053616425,
    "pool_absmean": 0.03290675053616425,
    "pool0": [
        0.00016436899022664875,
        0.003098044078797102,
        0.028918830677866936,
        0.0004867326351813972,
    ],
    "pool1_100": 0.007984030060470104,
    "logits_mean": -0.0008938872920153367,
    "logits0": [
        0.052741795778274536,
        -0.01423278171569109,
        0.05180332437157631,
        -0.008303102105855942,
    ],
}


@pytest.mark.slow
def test_inception_fid2015_activation_fingerprint():
    """Frozen end-to-end activation fingerprint: random weights (seed 7) +
    deterministic byte-gradient input -> pinned pool_3/logits values. Fails
    if ANY pooling/resize/padding/concat convention in the port drifts."""
    from gddim_tpu.evals.inception import InceptionV3, random_state_dict

    sd = random_state_dict(np.random.default_rng(7), n_classes=1008)
    imgs = (np.arange(2 * 32 * 32 * 3).reshape(2, 32, 32, 3) * 37 % 256).astype(
        np.float32
    )
    out = jax.jit(InceptionV3(sd, mode="fid2015").__call__)(jnp.asarray(imgs))
    p = np.asarray(out["pool_3"], np.float64)
    l = np.asarray(out["logits"], np.float64)
    assert p.shape == (2, 2048) and l.shape == (2, 1008)
    np.testing.assert_allclose(p.mean(), _FP2015["pool_mean"], rtol=1e-4)
    np.testing.assert_allclose(np.abs(p).mean(), _FP2015["pool_absmean"], rtol=1e-4)
    np.testing.assert_allclose(p[0, ::512], _FP2015["pool0"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(p[1, 100], _FP2015["pool1_100"], rtol=1e-3)
    np.testing.assert_allclose(l.mean(), _FP2015["logits_mean"], rtol=1e-4)
    np.testing.assert_allclose(l[0, ::300], _FP2015["logits0"], rtol=1e-3, atol=1e-6)
