"""DEIS coefficient engine vs exact integrals on analytic systems."""

import numpy as np
import pytest

from gddim_tpu.math import deis
from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.linalg2 import mat2


class PolySDE:
    """Analytic test system: Psi == I, eps integrand == diag(t^2, 2t).

    The AB coefficient C_j = int E(tau) L_j(tau) dtau is then an exact
    polynomial integral we can compute with numpy.polynomial.
    """

    def psi(self, s, t):
        s = np.asarray(s, dtype=np.float64)
        shape = np.broadcast_shapes(np.shape(s), np.shape(t))
        return np.broadcast_to(np.eye(2), shape + (2, 2)).copy()

    def eps_integrand(self, t):
        t = np.asarray(t, dtype=np.float64)
        z = np.zeros_like(t)
        return mat2(t**2, z, z, 2 * t)

    def F(self, t):
        t = np.asarray(t, dtype=np.float64)
        z = np.zeros_like(t)
        return mat2(z, z, z, z)


def _exact_poly_coef(t0, t1, support, j, powers=(2, 1), scales=(1.0, 2.0)):
    """Exact int_{t0}^{t1} diag(t^2, 2t) L_j(t) dt via polynomial algebra."""
    lag = np.polynomial.Polynomial([1.0])
    for k, tk in enumerate(support):
        if k == j:
            continue
        lag = lag * np.polynomial.Polynomial([-tk, 1.0]) / (support[j] - tk)
    out = np.zeros((2, 2))
    for d, (p, s) in enumerate(zip(powers, scales)):
        mono = np.polynomial.Polynomial([0.0] * p + [s])
        integ = (mono * lag).integ()
        out[d, d] = integ(t1) - integ(t0)
    return out


def test_lagrange_basis_partition_of_unity():
    support = np.array([1.0, 0.7, 0.3])
    xs = np.linspace(0.2, 1.1, 50)
    total = sum(deis.lagrange_basis(xs, support, j) for j in range(3))
    np.testing.assert_allclose(total, 1.0, rtol=1e-12)
    # interpolation property: L_j(t_k) = delta_jk
    for j in range(3):
        vals = deis.lagrange_basis(support, support, j)
        np.testing.assert_allclose(vals, np.eye(3)[j], atol=1e-12)


def test_ab_coef_matches_exact_integral():
    sde = PolySDE()
    rev_ts = np.array([1.0, 0.75, 0.5, 0.3, 0.15, 0.05])
    order = 2
    coefs = deis.ab_eps_coef(sde, rev_ts, order, n_quad=200_000)
    for i in range(len(rev_ts) - 1):
        o = min(i, order)
        support = rev_ts[i - o : i + 1][::-1]
        for j in range(o + 1):
            exact = _exact_poly_coef(rev_ts[i], rev_ts[i + 1], support, j)
            np.testing.assert_allclose(coefs[i, j], exact, rtol=1e-4, atol=1e-7)
        # padding beyond the effective order is exactly zero
        np.testing.assert_allclose(coefs[i, o + 1 :], 0.0)


def test_ab_warmup_structure():
    sde = PolySDE()
    rev_ts = np.linspace(1.0, 0.1, 8)
    coefs = deis.ab_eps_coef(sde, rev_ts, order=3, n_quad=100)
    assert coefs.shape == (7, 5, 2, 2)
    for i in range(7):
        nonzero = min(i, 3) + 1
        assert np.abs(coefs[i, nonzero:]).max() == 0.0


def test_order0_matches_ab_order0():
    host = HostCLD(CLDParams())
    rev_ts = np.linspace(1.0, 0.001, 6)
    c_ab = deis.ab_eps_coef(host, rev_ts, order=0, n_quad=1000)
    c_o0 = deis.order0_eps_coef(host, rev_ts, n_quad=1000)
    np.testing.assert_allclose(c_ab[:, 0], c_o0, rtol=1e-12)


def test_deis_stack_layout():
    host = HostCLD(CLDParams())
    rev_ts = np.power(np.linspace(1.0, np.sqrt(1e-3), 11) ** 2, 1.0)
    stack = deis.deis_coef_stack(host, rev_ts, order=2, n_quad=2000)
    assert stack.shape == (10, 5, 2, 2)  # [Psi | 4 eps slots]
    np.testing.assert_allclose(
        stack[:, 0], host.psi(rev_ts[:-1], rev_ts[1:]), rtol=1e-12
    )
    assert np.isfinite(stack).all()


def test_am_coef_exact_integral():
    sde = PolySDE()
    rev_ts = np.array([1.0, 0.7, 0.45, 0.25, 0.1])
    order = 2
    coefs = deis.am_eps_coef(sde, rev_ts, order, n_quad=200_000)
    for i in range(len(rev_ts) - 1):
        o = min(i + 1, order)
        support = rev_ts[i - o + 1 : i + 2][::-1]
        for j in range(o + 1):
            exact = _exact_poly_coef(rev_ts[i], rev_ts[i + 1], support, j)
            np.testing.assert_allclose(coefs[i, j], exact, rtol=1e-4, atol=1e-7)


def test_naive_em_coef():
    host = HostCLD(CLDParams())
    rev_ts = np.linspace(1.0, 0.01, 5)
    mean, eps = deis.naive_em_coef(host, rev_ts)
    dt = rev_ts[1] - rev_ts[0]
    np.testing.assert_allclose(mean[0], np.eye(2) + host.F(rev_ts[0]) * dt, rtol=1e-12)
    np.testing.assert_allclose(eps[0], host.eps_integrand(rev_ts[0]) * dt, rtol=1e-12)


def test_cld_ab_converges_with_order():
    """Higher AB order -> lower one-step extrapolation error on CLD.

    Integrates the reverse update for a known smooth eps(t) (polynomial in t)
    and compares against dense quadrature of the true integral.
    """
    host = HostCLD(CLDParams())
    rev_ts = np.power(np.linspace(1.0, np.sqrt(0.05), 13), 2)

    def eps_traj(t):
        return np.stack([0.3 + 0.5 * t - 0.2 * t**2, -0.1 + t], axis=-1)

    def true_integral(t0, t1, n=200_000):
        taus = t0 + (t1 - t0) * np.arange(n) / n
        dt = (t1 - t0) / n
        core = np.einsum(
            "nij,njk->nik", host.psi(taus, t1), host.eps_integrand(taus)
        )
        return np.einsum("nij,nj->i", core, eps_traj(taus)) * dt

    errs = {}
    for order in [0, 1, 2]:
        coefs = deis.ab_eps_coef(host, rev_ts, order, n_quad=20_000)
        # measure at the last step (full order warm-up complete)
        i = len(rev_ts) - 2
        approx = np.zeros(2)
        for j in range(order + 1):
            approx += coefs[i, j] @ eps_traj(rev_ts[i - j])
        errs[order] = np.abs(approx - true_integral(rev_ts[i], rev_ts[i + 1])).max()
    assert errs[1] < errs[0] * 0.5
    assert errs[2] < errs[1]
