"""`sampling.reference_exact` gates the three intentional divergences.

Our default numerics fix three reference bugs (monotone hybdeis grid,
transposed sdeis Lyapunov, schedule-consistent blur integrand). Released
artifacts / paper numbers may depend on the buggy paths, so the flag must
reproduce the reference behavior bit-for-bit. Both branches are exercised.
"""

import numpy as np
from scipy.integrate import solve_ivp

from gddim_tpu.math.cld_host import HostCLD
from gddim_tpu.math.variants import HostLambdaSDE
from gddim_tpu.samplers.timegrid import hybrid_time_grid, rev_time_grid


# --- 1. hybdeis grid (cld_jax/sampling.py:255-269) ---------------------------


def test_hybdeis_grid_reference_exact_reproduces_nonmonotone_grid():
    T, eps, num_step, ts_order = 1.0, 1e-3, 19, 2.0
    grid = hybrid_time_grid(T, eps, num_step, ts_order, reference_exact=True)
    # the reference's formula, inline: linear noise segment, then a FULL-range
    # power-law segment restarting at T
    mid_t = T * 0.3
    noise_nfe = int(num_step * 0.3)
    img_nfe = num_step - noise_nfe
    expected = np.concatenate(
        [
            np.linspace(T, mid_t, noise_nfe, endpoint=False),
            np.linspace(T ** (1 / ts_order), eps ** (1 / ts_order), img_nfe + 1)
            ** ts_order,
        ]
    )
    np.testing.assert_allclose(grid, expected, rtol=0, atol=1e-14)
    assert (np.diff(grid) > 0).any(), "reference grid should be non-monotone"


def test_hybdeis_grid_default_is_monotone():
    grid = hybrid_time_grid(1.0, 1e-3, 19, 2.0, reference_exact=False)
    assert (np.diff(grid) < 0).all()
    # same endpoints and length either way
    ref = hybrid_time_grid(1.0, 1e-3, 19, 2.0, reference_exact=True)
    assert grid.shape == ref.shape
    assert grid[0] == ref[0] and grid[-1] == ref[-1]


# --- 2. sdeis Lyapunov covariance (cld_jax/sde_lib.py:382-399) ----------------


def test_sdeis_cov_reference_exact_matches_untransposed_ode():
    host = HostCLD()
    lam_ref = HostLambdaSDE(host, 1.0, reference_exact=True)
    s, t = 0.8, 0.5  # a representative reverse step
    got = lam_ref.cond_rev_cov(s, t, n_step=10_000)

    # independent solve of the *untransposed* ODE the reference integrates:
    # dP/dtau = F_hat P + P F_hat + sign * lambda^2 G G^T
    def rhs(tau, y):
        p = y.reshape(2, 2)
        a = lam_ref.hat_F(tau)
        g = host.G(tau)
        return (a @ p + p @ a - (g @ g.T)).reshape(-1)

    sol = solve_ivp(rhs, (s, t), np.zeros(4), method="DOP853", rtol=1e-12, atol=1e-14)
    expected = sol.y[:, -1].reshape(2, 2)
    # RK4-10k with the reference's stage-grid mismatch: agreement is O(1e-3)
    assert np.abs(got - expected).max() / np.abs(expected).max() < 2e-3
    # the buggy path's signature: a visibly non-symmetric "covariance"
    asym = np.abs(got - got.T).max() / np.abs(got).max()
    assert asym > 1e-3


def test_sdeis_cov_default_is_symmetric_and_differs_from_reference():
    host = HostCLD()
    s, t = 0.8, 0.5
    fixed = HostLambdaSDE(host, 1.0, reference_exact=False).cond_rev_cov(s, t, 10_000)
    buggy = HostLambdaSDE(host, 1.0, reference_exact=True).cond_rev_cov(s, t, 10_000)
    assert np.abs(fixed - fixed.T).max() / np.abs(fixed).max() < 1e-9
    assert np.abs(fixed - buggy).max() / np.abs(fixed).max() > 1e-3


# --- 3. blur eps integrand (blur_jax/sde_lib.py:58-77) ------------------------


def test_blur_integrand_reference_exact_matches_reference_formula():
    import jax.numpy as jnp

    from gddim_tpu.math.blur import BlurSDE
    from gddim_tpu.math.deis_scalar import blur_ab_eps_coef

    sde = BlurSDE(img_dim=8, sigma_blur_max=10.0)
    rev_ts = rev_time_grid(sde.sampling_T, 1e-3, 6, 2.0)

    ref_coef = blur_ab_eps_coef(sde, rev_ts, order=0, n_quad=64, reference_exact=True)
    our_coef = blur_ab_eps_coef(sde, rev_ts, order=0, n_quad=64, reference_exact=False)
    # branches genuinely differ (the reference drops the D'/D drift term)
    assert np.abs(ref_coef - our_coef).max() / np.abs(our_coef).max() > 1e-3

    # independent quadrature of the reference's own formula
    i = 2
    taus = rev_ts[i] + (rev_ts[i + 1] - rev_ts[i]) * np.arange(64) / 64
    dt = (rev_ts[i + 1] - rev_ts[i]) / 64
    taus_j = jnp.asarray(taus)
    psi = np.asarray(sde.psi(taus_j, jnp.full_like(taus_j, rev_ts[i + 1])))
    g = np.asarray(sde.G(taus_j))
    alpha = np.asarray(sde.t2alpha_fn(taus_j))
    integrand = 0.5 * g * g / np.sqrt(1 - alpha)[:, None, None, None]
    expected = (psi * integrand).sum(0) * dt
    np.testing.assert_allclose(ref_coef[i, 0], expected, rtol=1e-6, atol=1e-12)
