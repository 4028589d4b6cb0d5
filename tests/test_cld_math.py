"""Analytic unit tests for the CLD math core (SURVEY.md section 4 strategy)."""

import numpy as np
import pytest
from scipy.linalg import expm

from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.linalg2 import inv2, psd_sqrt_factor


@pytest.fixture(scope="module")
def host():
    return HostCLD(CLDParams())


def test_psi_matches_matrix_exponential(host):
    """Closed-form Psi(s,t) == expm(int_s^t F dtau) (constant-direction F)."""
    for s, t in [(0.0, 0.3), (0.2, 0.9), (0.5, 0.51), (0.0, 1.0)]:
        tau = host.beta_int(t) - host.beta_int(s)
        # int F dtau = tau * [[0, m_inv], [-1, -gamma*m_inv]]
        m = tau * np.array(
            [[0.0, host.p.m_inv], [-1.0, -host.p.gamma * host.p.m_inv]]
        )
        np.testing.assert_allclose(host.psi(s, t), expm(m), rtol=1e-12, atol=1e-12)


def test_psi_composition(host):
    """Psi(s,t) = Psi(m,t) @ Psi(s,m) (flow property)."""
    s, m, t = 0.1, 0.4, 0.8
    np.testing.assert_allclose(
        host.psi(s, t), host.psi(m, t) @ host.psi(s, m), rtol=1e-12, atol=1e-12
    )


def test_f1_psi_is_rotation_exponential(host):
    """f1_psi closed form vs scipy expm (sde_lib.py:120-143).

    Note: the reference's docstring says expm(-int F1) but its code computes
    expm(+int_s^t F1); we follow the code (that is what defines MLCLD behavior).
    """
    s, t = 0.0, 0.7
    tau = host.beta_int(t) - host.beta_int(s)
    m = tau * np.array([[0.0, host.p.m_inv], [-1.0, 0.0]])
    np.testing.assert_allclose(host.f1_psi(s, t), expm(m), rtol=1e-10, atol=1e-12)
    # psi1 and inv_psi1 invert each other
    np.testing.assert_allclose(
        host.psi1(0.6) @ host.inv_psi1(0.6), np.eye(2), atol=1e-12
    )


def test_r_solution_satisfies_ode(host):
    """Finite-difference check of dR/dt = F R + 1/2 G G^T R^{-T}."""
    for t in [0.05, 0.3, 0.7, 0.95]:
        h = 1e-6
        dr_fd = (host.R(t + h) - host.R(t - h)) / (2 * h)
        r = host.R(t)
        rhs = host.F(t) @ r + 0.5 * (host.G(t) @ host.G(t).T) @ inv2(r).T
        np.testing.assert_allclose(dr_fd, rhs, rtol=5e-4, atol=5e-6)


def test_r_matches_fixed_step_rk4(host):
    """Dense solve_ivp R(t) vs a reference-style fixed-step RK4 integration.

    Mirrors cld_jax/sde_lib.py:93-107 at a coarser dt; agreement at the RK4
    truncation level confirms both converge to the same R(t).
    """
    dt = 1e-4
    n = int(0.5 / dt)
    r = host.R0.copy()

    def rhs(rr, t):
        return host.F(t) @ rr + 0.5 * (host.G(t) @ host.G(t).T) @ inv2(rr).T

    t = 0.0
    for _ in range(n):
        k1 = rhs(r, t)
        k2 = rhs(r + 0.5 * dt * k1, t + 0.5 * dt)
        k3 = rhs(r + 0.5 * dt * k2, t + 0.5 * dt)
        k4 = rhs(r + dt * k3, t + dt)
        r = r + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += dt
    np.testing.assert_allclose(host.R(0.5), r, rtol=1e-6, atol=1e-9)


def test_cov_is_spd_and_grows(host):
    ts = np.linspace(0.05, 1.0, 10)
    covs = host.cov(ts)
    np.testing.assert_allclose(covs, covs.swapaxes(-1, -2), atol=1e-12)
    eigs = np.linalg.eigvalsh(covs)
    assert (eigs > 0).all()
    # At t=T the process is close to its stationary prior: cov ~ diag(1, 1/m)
    cov_T = host.cov(1.0)
    np.testing.assert_allclose(
        np.diag(cov_T), [1.0, 1.0 / host.p.m_inv], rtol=0.05
    )


def test_psd_sqrt_factor():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 2, 2))
    cov = a @ a.swapaxes(-1, -2)
    f = psd_sqrt_factor(cov)
    np.testing.assert_allclose(f @ f.swapaxes(-1, -2), cov, rtol=1e-10, atol=1e-12)
    # degenerate covariance (all zeros) must not NaN
    z = psd_sqrt_factor(np.zeros((2, 2)))
    np.testing.assert_allclose(z, 0.0)


def test_device_cld_matches_host():
    import jax.numpy as jnp

    from gddim_tpu.math.cld import CLD

    host = HostCLD(CLDParams())
    dev = CLD.create(CLDParams())
    ts = np.linspace(1e-3, 1.0, 50)
    np.testing.assert_allclose(
        np.asarray(dev.R(jnp.asarray(ts))), host.R(ts), rtol=2e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(dev.psi(jnp.zeros(5), jnp.asarray(ts[:5]))),
        host.psi(np.zeros(5), ts[:5]),
        rtol=1e-5,
        atol=1e-7,
    )


def test_device_perturb_and_score_shapes():
    import jax
    import jax.numpy as jnp

    from gddim_tpu.math.cld import CLD

    dev = CLD.create(CLDParams())
    rng = jax.random.PRNGKey(0)
    batch = jnp.ones((4, 8, 8, 3, 2))
    ts = jnp.linspace(0.1, 0.9, 4)
    pert, mean, z = dev.perturb_data(batch, ts, rng)
    assert pert.shape == batch.shape == mean.shape == z.shape
    score = dev.eps2score(z, ts)
    assert score.shape == batch.shape
    # eps2score inverts the noise factor: R^T @ (-score) == z
    rs = np.asarray(dev.R(ts))
    recon = np.einsum("bji,b...dj->b...di", rs, -np.asarray(score))
    np.testing.assert_allclose(recon, np.asarray(z), rtol=1e-4, atol=1e-5)


def test_prior_sampling_stats():
    import jax

    from gddim_tpu.math.cld import CLD

    dev = CLD.create(CLDParams())
    u = dev.prior_sampling(jax.random.PRNGKey(0), (2000, 4))
    u = np.asarray(u)
    assert u.shape == (2000, 4, 2)
    np.testing.assert_allclose(u[..., 0].std(), 1.0, rtol=0.05)
    np.testing.assert_allclose(u[..., 1].std(), 0.5, rtol=0.05)  # 1/sqrt(m_inv)=0.5
