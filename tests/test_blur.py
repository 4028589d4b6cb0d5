"""Blur package: DCT kernels, BlurSDE schedule, order-0 DCT-space sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.fft

from gddim_tpu.math import dct
from gddim_tpu.math.blur import BlurSDE, batch_mul


def test_dct_matches_scipy(rng):
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(dct.batch_img_dct(jnp.asarray(x)))
    exp = scipy.fft.dctn(x.astype(np.float64), type=2, axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_idct_matches_scipy(rng):
    y = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(dct.batch_img_idct(jnp.asarray(y)))
    exp = scipy.fft.idctn(y.astype(np.float64), type=2, axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_dct_roundtrip_and_orthonormality(rng):
    x = rng.normal(size=(1, 16, 16, 2)).astype(np.float32)
    y = dct.batch_img_dct(jnp.asarray(x))
    back = dct.batch_img_idct(y)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-5)
    # Parseval: orthonormal transform preserves energy
    np.testing.assert_allclose(
        np.sum(np.asarray(y) ** 2), np.sum(x**2), rtol=1e-5
    )


def test_dct_matches_reference_normalization():
    """The reference's FFT-based DCT normalization (blur_jax/blur.py:27-35)
    equals the orthonormal DCT-II: factor sqrt(N)*2 for k=0, sqrt(2N) else
    applied to 2*V -- i.e. scipy norm='ortho'. Check on an impulse and ramp."""
    n = 8
    for sig in [np.eye(n)[0], np.arange(n, dtype=np.float64)]:
        exp = scipy.fft.dct(sig, type=2, norm="ortho")
        got = dct.dct_matrix(n) @ sig
        np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_blur_schedule_invariants():
    sde = BlurSDE()
    # alpha2t inverts t2alpha
    ts = jnp.linspace(0.01, 0.99, 7)
    np.testing.assert_allclose(
        np.asarray(sde.alpha2t_fn(sde.t2alpha_fn(ts))),
        np.asarray(ts),
        rtol=1e-3,
        atol=1e-4,  # f32 arccos(sqrt(cos^2)) roundtrip
    )
    # sampling_T corresponds to rho=80 (reference :33-35)
    assert 0.9 < sde.sampling_T < 1.0
    # dalpha/dt matches finite differences
    for t in [0.1, 0.5, 0.9]:
        h = 1e-3
        fd = (sde.t2alpha_fn(t + h) - sde.t2alpha_fn(t - h)) / (2 * h)
        np.testing.assert_allclose(float(sde.dalpha_dt_fn(t)), float(fd), rtol=1e-2)
    # frequency scaling is in (min_scale, 1]
    d = np.asarray(sde.get_frequency_scaling(jnp.asarray([0.5])))
    assert d.shape == (1, 32, 32, 1)
    assert (d <= 1.0 + 1e-6).all() and (d >= sde.min_scale - 1e-9).all()
    # DC frequency is never damped
    np.testing.assert_allclose(d[0, 0, 0, 0], 1.0, rtol=1e-6)


def test_blur_perturb_consistency(rng):
    """perturb_data must equal mean(iDCT(m .* DCT(x))) + s*eps."""
    sde = BlurSDE(img_dim=16)
    x = jnp.asarray(rng.normal(size=(3, 16, 16, 1)).astype(np.float32))
    ts = jnp.asarray([0.2, 0.5, 0.8])
    key = jax.random.PRNGKey(0)
    x_t, mean, eps = sde.perturb_data(x, ts, key)
    manual_mean = sde.y2x(batch_mul(sde.y_mean_coef(ts), sde.x2y(x)))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(manual_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(x_t),
        np.asarray(mean + batch_mul(sde.y_std_coef(ts), eps)),
        rtol=1e-5,
        atol=1e-6,
    )
    # at t->0 the perturbation is nearly the identity on the mean
    x_t0, mean0, _ = sde.perturb_data(x, jnp.asarray([1e-4] * 3), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(mean0), np.asarray(x), rtol=1e-2, atol=5e-3)


def test_blur_xeps2x0_roundtrip(rng):
    """xeps2x0 recovers the clean image given the true eps."""
    sde = BlurSDE(img_dim=16)
    x0 = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    ts = jnp.asarray([0.3, 0.6])
    x_t, mean, eps = sde.perturb_data(x0, ts, jax.random.PRNGKey(2))
    rec = sde.xeps2x0(x_t, ts, eps)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_blur_order0_sampler_exact_on_gaussian():
    """With the exact y-space eps for unit-Gaussian pixel data the sampler's
    final marginal must match the data: each DCT coefficient has
    y_t ~ N(0, m_t^2 + s_t^2) and eps_y(y, t) = s_t y / (m_t^2 + s_t^2)...
    simpler invariant: for data == 0, exact eps_y = y / s_t recovers y0 == 0.
    """
    import ml_collections

    from gddim_tpu.samplers.blur import build_blur_sampler

    sde = BlurSDE(img_dim=8)
    cfg = ml_collections.ConfigDict()
    cfg.sampling = dict(method="order0", nfe=20, ts_order=2)

    def yeps_apply(variables, y, t_vec):
        del variables
        return batch_mul(1.0 / sde.y_std_coef(t_vec), y)

    fn = build_blur_sampler(cfg, sde, yeps_apply, (8, 8, 1), lambda x: x)
    x, nfe = fn(jax.random.PRNGKey(0), {}, batch_size=16)
    assert nfe == 20
    assert x.shape == (16, 8, 8, 1)
    # delta data at 0: the exact eps pulls every sample to ~0
    assert np.abs(np.asarray(x)).max() < 0.05


def test_blur_scalar_deis_order0_matches_ddim_update():
    """For the exact linear SDE the quadrature order-0 coefficient must equal
    the closed-form DDIM update: C_0 == s(t') - psi(t,t') * s(t). This
    validates the blur psi/G/eps_integrand algebra end-to-end."""
    from gddim_tpu.math.deis_scalar import blur_deis_coef
    from gddim_tpu.samplers.timegrid import rev_time_grid

    sde = BlurSDE(img_dim=8)
    rev_ts = rev_time_grid(sde.sampling_T, 1e-3, 8, 2.0)
    x_coef, eps_coef = blur_deis_coef(sde, rev_ts, order=0, n_quad=20000)
    ts = jnp.asarray(rev_ts)
    s = np.asarray(sde.y_std_coef(ts), dtype=np.float64)  # (N+1,)
    expected = s[1:, None, None, None] - x_coef * s[:-1, None, None, None]
    np.testing.assert_allclose(eps_coef[:, 0], expected, rtol=5e-3, atol=1e-5)


def test_blur_deis_sampler_improves_on_order0():
    """Order-2 frequency-space DEIS beats order-0 at equal NFE on a smooth
    analytic eps (Gaussian data)."""
    import ml_collections

    from gddim_tpu.samplers.blur import (
        build_blur_deis_sampler,
        build_blur_sampler,
    )

    sde = BlurSDE(img_dim=8)

    def yeps_apply(variables, y, t_vec):
        del variables
        m = sde.y_mean_coef(t_vec)
        s = sde.y_std_coef(t_vec)
        var = m * m + batch_mul(s * s, jnp.ones_like(y))
        return batch_mul(s, y) / var

    # ground truth: very fine order0 run from the same prior draw
    def run(method, nfe, order, u0):
        cfg = ml_collections.ConfigDict()
        cfg.sampling = dict(method=method, nfe=nfe, ts_order=2, deis_order=order)
        build = build_blur_deis_sampler if method == "deis" else build_blur_sampler
        fn = build(cfg, sde, yeps_apply, (8, 8, 1), lambda x: x)
        # u0 buffers are donated by the jitted sampler; hand over a copy
        x, _ = fn(jax.random.PRNGKey(0), {}, u0=jnp.array(u0))
        return np.asarray(x)

    u0 = sde.prior_sampling(jax.random.PRNGKey(7), (32, 8, 8, 1))
    ref = run("order0", 800, 0, u0)
    # measured (NFE: order0 / deis-o1 / deis-o2):
    #   20: 1.11 / 0.74 / 0.52      40: 0.60 / 0.24 / 0.11
    # (at NFE<=10 high-order AB is unstable here — the early-step frequency
    # ratios m(t')/m(t) are enormous for strongly damped frequencies)
    err0 = np.abs(run("order0", 20, 0, u0) - ref).max()
    err2 = np.abs(run("deis", 20, 2, u0) - ref).max()
    assert err2 < err0 * 0.6, (err0, err2)
    err0_40 = np.abs(run("order0", 40, 0, u0) - ref).max()
    err2_40 = np.abs(run("deis", 40, 2, u0) - ref).max()
    assert err2_40 < err0_40 * 0.25, (err0_40, err2_40)


def test_blur_sampler_preserves_gaussian_marginals():
    """For x0 ~ N(0, I): the exact eps_y is s_t y/(m_t^2+s_t^2); running the
    order-0 sampler must land near N(0, I) in pixel space."""
    import ml_collections

    from gddim_tpu.samplers.blur import build_blur_sampler

    sde = BlurSDE(img_dim=8)
    cfg = ml_collections.ConfigDict()
    cfg.sampling = dict(method="order0", nfe=100, ts_order=2)

    def yeps_apply(variables, y, t_vec):
        del variables
        m = sde.y_mean_coef(t_vec)
        s = sde.y_std_coef(t_vec)
        var = m * m + batch_mul(s * s, jnp.ones_like(y))
        return batch_mul(s, y) / var

    fn = build_blur_sampler(cfg, sde, yeps_apply, (8, 8, 1), lambda x: x)
    x, _ = fn(jax.random.PRNGKey(3), {}, batch_size=512)
    std = np.asarray(x).std()
    assert abs(std - 1.0) < 0.1, std


def test_blur_factory_dispatch_deis():
    """run_lib's blur sampler builder dispatches both order0 and deis."""
    import ml_collections

    from gddim_tpu.samplers.blur import build_blur_sampler_from_config

    sde = BlurSDE(img_dim=8)

    def yeps_apply(variables, y, t_vec):
        del variables
        return batch_mul(1.0 / sde.y_std_coef(t_vec), y)

    for method in ["order0", "deis"]:
        cfg = ml_collections.ConfigDict()
        cfg.sampling = dict(method=method, nfe=6, ts_order=2, deis_order=1)
        fn = build_blur_sampler_from_config(cfg, sde, yeps_apply, (8, 8, 1), lambda x: x)
        x, nfe = fn(jax.random.PRNGKey(0), {}, batch_size=4)
        assert x.shape == (4, 8, 8, 1)
        assert nfe == 6
        assert np.isfinite(np.asarray(x)).all()


def test_dct_fft_impl_matches_matmul_and_scipy(rng):
    """The reference-style FFT DCT path (DCT_IMPL='fft', the x1-baseline
    implementation for bench.py --family blur) agrees with scipy and with the
    production matmul path, including odd sizes and the inverse."""
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ref = scipy.fft.dctn(x.astype(np.float64), type=2, axes=(1, 2), norm="ortho")
    mat = np.asarray(dct.dct2(jnp.asarray(x)))
    old = dct.DCT_IMPL
    try:
        dct.DCT_IMPL = "fft"
        fft = np.asarray(dct.dct2(jnp.asarray(x)))
        back = np.asarray(dct.idct2(jnp.asarray(fft)))
        x5 = rng.normal(size=(1, 5, 7, 2)).astype(np.float32)
        r5 = scipy.fft.dctn(
            x5.astype(np.float64), type=2, axes=(1, 2), norm="ortho"
        )
        g5 = np.asarray(dct.dct2(jnp.asarray(x5)))
        b5 = np.asarray(dct.idct2(jnp.asarray(g5)))
    finally:
        dct.DCT_IMPL = old
    np.testing.assert_allclose(fft, ref, atol=5e-5)
    np.testing.assert_allclose(fft, mat, atol=5e-5)
    np.testing.assert_allclose(back, x, atol=5e-5)
    np.testing.assert_allclose(g5, r5, atol=5e-5)
    np.testing.assert_allclose(b5, x5, atol=5e-5)
