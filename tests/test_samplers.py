"""End-to-end sampler correctness on an analytically solvable problem.

For data concentrated at 0, the perturbed marginal at time t is N(0, Sigma_t)
with Sigma_t = R R^T, and the *exact* epsilon function is linear:
eps(u, t) = R(t)^{-1} u. The probability-flow ODE is then the linear system
du/dt = (F + 1/2 G G^T Sigma^{-1}) u, whose transition matrix we can integrate
to float64 accuracy with scipy. Every deterministic sampler must converge to
that exact linear map; sdeis with lambda=0 at order 0 must match it exactly
step-for-step (its coefficients ARE the transition). This exercises the whole
pipeline: R(t) ODE -> quadrature -> bundles -> scan engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from gddim_tpu.math.cld import CLD
from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.linalg2 import inv2, sbmm
from gddim_tpu.samplers import coefs
from gddim_tpu.samplers.engine import ab_sample, sscs_sample


@pytest.fixture(scope="module")
def host():
    return HostCLD(CLDParams())


@pytest.fixture(scope="module")
def dev():
    return CLD.create(CLDParams())


@pytest.fixture(scope="module")
def exact_transition(host):
    """Phi with u(sampling_eps) = Phi @ u(T) for the exact PF ODE (float64).

    The PF drift F + ½GGᵀΣ⁻¹ is exactly F̂ at λ=0, so the λ-SDE's fast
    scalar-RHS dense solver computes it (DOP853, rtol 1e-12)."""
    from gddim_tpu.math.variants import HostLambdaSDE

    dense = HostLambdaSDE(host, 0.0)._hat_psi_dense(
        host.p.T, host.p.sampling_eps
    )
    return np.asarray(dense(host.p.sampling_eps)).reshape(2, 2)


def make_eps_fn(dev):
    """Exact analytic eps for delta-at-zero data: eps(u, t) = R(t)^{-1} u."""

    def eps_fn(u, t):
        inv_r = inv2(dev.R(t))  # scalar t -> (2, 2)
        return sbmm(inv_r, u)

    return eps_fn


def make_smooth_eps_fn(dev):
    """Exact eps for Gaussian N(0, I) data per scalar dim (smooth in t).

    Marginal cov Sm(t) = Psi(0,t) Psi(0,t)^T + Sigma(t);
    eps(u, t) = R(t)^T Sm(t)^{-1} u. Unlike the delta-data eps this has bounded
    derivatives near t=eps, so the AB schemes exhibit their design order.
    """

    def eps_fn(u, t):
        ps = dev.psi(jnp.zeros_like(t), t)
        sm = ps @ ps.T + dev.cov(t)
        m = dev.R(t).T @ inv2(sm)
        return sbmm(m, u)

    return eps_fn


def smooth_exact_transition(host):
    def sm(t):
        ps = host.psi(0.0, t)
        return ps @ ps.T + host.cov(t)

    def rhs(t, y):
        phi = y.reshape(2, 2)
        eps_m = host.R(t).T @ inv2(sm(t))
        m = host.F(t) + 0.5 * (host.G(t) @ host.G(t).T) @ (
            inv2(host.R(t)).T @ eps_m
        )
        return (m @ phi).reshape(-1)

    sol = solve_ivp(
        rhs,
        (host.p.T, host.p.sampling_eps),
        np.eye(2).reshape(-1),
        method="DOP853",
        rtol=1e-12,
        atol=1e-14,
    )
    assert sol.success
    return sol.y[:, -1].reshape(2, 2)


def _u0(n=64):
    rng = jax.random.PRNGKey(0)
    return CLD.create(CLDParams()).prior_sampling(rng, (n, 4))


def _rel_err(approx, exact):
    return np.abs(approx - exact).max() / max(np.abs(exact).max(), 1e-12)


@pytest.mark.slow
def test_deis_order_acceleration(host, dev):
    """Higher DEIS order -> much lower error at fixed NFE (the gDDIM claim),
    measured against the exact PF transition for smooth Gaussian data."""
    u0 = _u0()
    exact_t = smooth_exact_transition(host)
    exact = np.einsum("ij,b...j->b...i", exact_t, np.asarray(u0))
    eps_fn = make_smooth_eps_fn(dev)
    errs = {}
    for order in [0, 1, 2, 3]:
        b = coefs.deis_bundle(host, nfe=40, order=order, denoising=False)
        out = np.asarray(ab_sample(eps_fn, u0, b))
        errs[order] = _rel_err(out, exact)
    # measured on this problem: ~0.19 / 0.057 / 0.013 / 0.006
    assert errs[1] < errs[0] * 0.5
    assert errs[2] < errs[1] * 0.5
    assert errs[3] < errs[2]
    assert errs[3] < 0.02


@pytest.mark.slow
def test_deis_converges_with_nfe(host, dev):
    u0 = _u0()
    exact_t = smooth_exact_transition(host)
    exact = np.einsum("ij,b...j->b...i", exact_t, np.asarray(u0))
    eps_fn = make_smooth_eps_fn(dev)
    errs = []
    for nfe in [10, 20, 40]:
        b = coefs.deis_bundle(host, nfe=nfe, order=2, denoising=False)
        errs.append(_rel_err(np.asarray(ab_sample(eps_fn, u0, b)), exact))
    # order-2: each NFE doubling cuts error by >3x on this problem
    assert errs[1] < errs[0] / 3
    assert errs[2] < errs[1] / 3


def test_deis_delta_data_floor(host, dev, exact_transition):
    """Delta-data eps = R^{-1} u is 1/sqrt-singular near t=eps; convergence is
    capped at ~O(1/NFE) (math, not implementation). Pin the observed floor."""
    u0 = _u0()
    exact = np.einsum("ij,b...j->b...i", exact_transition, np.asarray(u0))
    eps_fn = make_eps_fn(dev)
    b = coefs.deis_bundle(host, nfe=40, order=2, denoising=False)
    assert _rel_err(np.asarray(ab_sample(eps_fn, u0, b)), exact) < 1e-3


def test_order0_converges(host, dev, exact_transition):
    u0 = _u0()
    exact = np.einsum("ij,b...j->b...i", exact_transition, np.asarray(u0))
    eps_fn = make_eps_fn(dev)
    b = coefs.order0_bundle(host, nfe=100, denoising=False)
    assert _rel_err(np.asarray(ab_sample(eps_fn, u0, b)), exact) < 0.05
    # naive Euler variant is consistent too, just much worse (measured: 0.40
    # at NFE=400, 0.035 at NFE=4000 on the singular delta-data eps)
    b_em = coefs.order0_bundle(host, nfe=1000, denoising=False, is_em=True)
    assert _rel_err(np.asarray(ab_sample(eps_fn, u0, b_em)), exact) < 0.2


def test_mldeis_matches_deis_solution(host, dev, exact_transition):
    u0 = _u0()
    exact = np.einsum("ij,b...j->b...i", exact_transition, np.asarray(u0))
    eps_fn = make_eps_fn(dev)
    b = coefs.mldeis_bundle(host, nfe=20, order=2, denoising=False)
    out = np.asarray(ab_sample(eps_fn, u0, b))
    # mldeis ends at sampling_eps/2 in x-space via psi1(eps/2) rotation of the
    # y solution at sampling_eps; compare against the exact solution propagated
    # the same way: y(eps) = inv_psi1-map... easiest faithful check: mldeis at
    # high NFE agrees with itself at low NFE (internal convergence) and stays
    # within a few percent of the plain-deis exact endpoint.
    assert _rel_err(out, exact) < 0.05
    b2 = coefs.mldeis_bundle(host, nfe=40, order=2, denoising=False)
    out2 = np.asarray(ab_sample(eps_fn, u0, b2))
    assert _rel_err(out, out2) < 0.02


@pytest.mark.slow
def test_ldeis_converges(host, dev):
    """ldeis converges to the same exact PF transition, with a worse constant
    than deis (the gDDIM paper's motivation for the R-parameterization).
    Measured: 0.32 / 0.096 / 0.024 at NFE 20/40/80."""
    u0 = _u0()
    exact_t = smooth_exact_transition(host)
    exact = np.einsum("ij,b...j->b...i", exact_t, np.asarray(u0))
    eps_fn = make_smooth_eps_fn(dev)
    errs = []
    for nfe in [20, 40, 80]:
        b = coefs.ldeis_bundle(host, nfe=nfe, order=2, denoising=False)
        errs.append(_rel_err(np.asarray(ab_sample(eps_fn, u0, b)), exact))
    assert errs[1] < errs[0] / 2
    assert errs[2] < errs[1] / 2
    assert errs[2] < 0.05


def test_sdeis_lambda0_order0_is_exact(host, dev, exact_transition):
    """With lambda=0 the sdeis order-0 update IS the exact PF transition."""
    u0 = _u0()
    exact = np.einsum("ij,b...j->b...i", exact_transition, np.asarray(u0))
    eps_fn = make_eps_fn(dev)
    b = coefs.sdeis_bundle(
        host, nfe=10, order=0, lambda_coef=0.0, use_order0=True, denoising=False
    )
    # noise factors must vanish at lambda=0
    assert np.abs(b.noise_factors).max() < 1e-6
    out = np.asarray(ab_sample(eps_fn, u0, b, rng=jax.random.PRNGKey(1)))
    assert _rel_err(out, exact) < 2e-3


@pytest.mark.slow
def test_sdeis_stochastic_marginals(host, dev):
    """lambda=1 sdeis with the exact eps produces the analytic final marginal.

    Per-step the update is exactly u' = Psi_hat u + N(0, P) (the eps terms
    cancel against R^{-1}), so the final covariance is the recursion
    Sigma_{i+1} = Psi_hat Sigma_i Psi_hat^T + P_i — which equals Sigma(t_i)
    at every step (marginal preservation) EXCEPT the last, whose noise the
    sampler intentionally zeroes (reference sampling.py:420-422: deterministic
    final step)."""
    from gddim_tpu.math.variants import HostLambdaSDE

    n = 4000
    u0 = CLD.create(CLDParams()).prior_sampling(jax.random.PRNGKey(2), (n, 1))
    eps_fn = make_eps_fn(dev)
    b = coefs.sdeis_bundle(
        host, nfe=20, order=0, lambda_coef=1.0, use_order0=True, denoising=False
    )
    out = np.asarray(ab_sample(eps_fn, u0, b, rng=jax.random.PRNGKey(3)))
    emp_cov = np.cov(out.reshape(n, 2).T)
    lam = HostLambdaSDE(host, 1.0)
    hp = lam.hat_psi(b.rev_ts[-2], b.rev_ts[-1])
    expected = hp @ host.cov(b.rev_ts[-2]) @ hp.T  # last-step noise zeroed
    assert np.abs(emp_cov[1, 1] - expected[1, 1]) / expected[1, 1] < 0.1
    assert np.abs(emp_cov[0, 0] - expected[0, 0]) < 0.05
    # and with the last-step noise included it would be Sigma(eps): verify the
    # bundle's un-zeroed covariance closes the gap
    p_last = lam.cond_rev_cov(b.rev_ts[-2], b.rev_ts[-1])
    np.testing.assert_allclose(
        expected + p_last, host.cov(host.p.sampling_eps), rtol=1e-4, atol=1e-8
    )


@pytest.mark.slow
def test_lambda_sde_marginal_preservation(host):
    """The λ-SDE conditional covariance must satisfy
    Ψ̂ Σ(s) Ψ̂ᵀ + P(s,t) == Σ(t) (this is what exposes the reference's
    untransposed-Lyapunov bug, which we fix)."""
    from gddim_tpu.math.variants import HostLambdaSDE

    lam = HostLambdaSDE(host, 1.0)
    for s, t in [(1.0, 0.8), (0.6, 0.3), (0.2, 0.05)]:
        hp = lam.hat_psi(s, t)
        p = lam.cond_rev_cov(s, t)
        np.testing.assert_allclose(p, p.T, atol=1e-8)  # symmetric
        assert np.linalg.eigvalsh(p).min() > -1e-10  # PSD
        np.testing.assert_allclose(
            hp @ host.cov(s) @ hp.T + p, host.cov(t), rtol=1e-5, atol=1e-7
        )


def test_em_converges_at_high_nfe(host, dev, exact_transition):
    u0 = _u0()
    exact = np.einsum("ij,b...j->b...i", exact_transition, np.asarray(u0))
    eps_fn = make_eps_fn(dev)
    b = coefs.em_bundle(host, nfe=2000, lambda_coef=0.0, denoising=False)
    out = np.asarray(ab_sample(eps_fn, u0, b, rng=jax.random.PRNGKey(4)))
    assert _rel_err(out, exact) < 0.1  # Euler on the 1/sqrt-singular exact eps


def test_sscs_runs_and_contracts(host, dev):
    """SSCS smoke: finite output with plausible magnitude for exact score."""
    n = 2000
    u0 = CLD.create(CLDParams()).prior_sampling(jax.random.PRNGKey(5), (n, 1))
    eps_fn = make_eps_fn(dev)
    b = coefs.sscs_bundle(host, nfe=50, denoising=False)
    out = np.asarray(sscs_sample(eps_fn, u0, b, jax.random.PRNGKey(6)))
    assert np.isfinite(out).all()
    # the sampler should contract the position marginal toward the data (0)
    assert out[..., 0].std() < np.asarray(u0)[..., 0].std()


def test_denoising_step_runs(host, dev):
    u0 = _u0()
    eps_fn = make_eps_fn(dev)
    b = coefs.deis_bundle(host, nfe=10, order=2, denoising=True)
    out = np.asarray(ab_sample(eps_fn, u0, b))
    assert np.isfinite(out).all()
    assert b.nfe == 10  # denoise consumes one NFE (reference sampling.py:157)
    assert len(b.rev_ts) == 10  # 9 scan steps + 1 denoise


def _run_factory_dispatch(dev, methods):
    import ml_collections

    from gddim_tpu.samplers.factory import build_cld_sampler

    for method in methods:
        cfg = ml_collections.ConfigDict()
        cfg.sampling = dict(
            method=method,
            nfe=6,
            deis_order=1,
            ts_order=2,
            noise_removal=True,
            is_em=False,
            lambda_coef=0.5,
            sdeis_use_order0=False,
            noise_nfe_ratio=0.3,
            img_t_ratio=0.3,
        )

        def eps_apply(variables, u, t_vec):
            del variables
            return sbmm(inv2(dev.R(t_vec[0])), u)

        fn = build_cld_sampler(cfg, dev, eps_apply, (4,))
        x, v, nfe = fn(jax.random.PRNGKey(0), {}, batch_size=8)
        assert x.shape == (8, 4) and v.shape == (8, 4)
        assert nfe == 6
        assert np.isfinite(np.asarray(x)).all(), method


def test_factory_dispatch(dev):
    """The factory builds every plain scan-based sampler from a config."""
    _run_factory_dispatch(dev, ["deis", "order0", "em", "sscs", "hybdeis"])


@pytest.mark.slow
def test_factory_dispatch_variants(dev):
    """Variant samplers (lambda-SDE family) require the expensive host
    Lyapunov/psi2 tables — exercised in the slow tier."""
    _run_factory_dispatch(dev, ["sdeis", "ldeis", "mldeis"])


def test_factory_ode_sampler(dev):
    import ml_collections

    from gddim_tpu.samplers.factory import build_cld_sampler

    cfg = ml_collections.ConfigDict()
    cfg.sampling = dict(
        method="ode", noise_removal=False, rtol=1e-4, atol=1e-4, ode_method="RK45",
        nfe=0, deis_order=0, ts_order=2,
    )

    def eps_apply(variables, u, t_vec):
        del variables
        return sbmm(inv2(dev.R(t_vec[0])), u)

    fn = build_cld_sampler(cfg, dev, eps_apply, (2,))
    x, v, nfe = fn(jax.random.PRNGKey(0), {}, batch_size=4)
    assert x.shape == (4, 2)
    assert nfe > 10
    # the ODE endpoint contracts positions near zero for delta data
    assert np.abs(np.asarray(x)).max() < 0.2


def test_mesh_sharded_sampling_matches_single_device(host, dev):
    """Sampling with the batch sharded over the 8-device mesh produces the
    same trajectories as single-device (data-parallel sampling, replacing the
    reference's pmapped psampler)."""
    import ml_collections

    from gddim_tpu.parallel import make_mesh
    from gddim_tpu.samplers.factory import build_cld_sampler

    cfg = ml_collections.ConfigDict()
    cfg.sampling = dict(
        method="deis", nfe=8, deis_order=2, ts_order=2, noise_removal=False,
        is_em=False, lambda_coef=0.0, sdeis_use_order0=True,
        noise_nfe_ratio=0.3, img_t_ratio=0.3,
    )

    def eps_apply(variables, u, t_vec):
        del variables
        return sbmm(inv2(dev.R(t_vec[0])), u)

    u0 = dev.prior_sampling(jax.random.PRNGKey(0), (16, 4))
    fn_single = build_cld_sampler(cfg, dev, eps_apply, (4,))
    x1, v1, _ = fn_single(jax.random.PRNGKey(1), {}, u0=jnp.array(u0))
    mesh = make_mesh()
    fn_mesh = build_cld_sampler(cfg, dev, eps_apply, (4,), mesh=mesh)
    x2, v2, _ = fn_mesh(jax.random.PRNGKey(1), {}, u0=jnp.array(u0))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)


def test_edge_case_small_nfe(host, dev):
    """NFE=2 with denoising leaves a single scan step; NFE=1 without
    denoising is one step — both must produce valid shapes."""
    eps_fn = make_eps_fn(dev)
    u0 = _u0(8)
    for nfe, denoising in [(2, True), (1, False), (3, True)]:
        b = coefs.deis_bundle(host, nfe=nfe, order=2, denoising=denoising)
        out = np.asarray(ab_sample(eps_fn, u0, b))
        assert out.shape == np.asarray(u0).shape
        assert np.isfinite(out).all(), (nfe, denoising)
