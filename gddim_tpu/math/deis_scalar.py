"""Per-frequency (scalar) DEIS coefficients for blurring diffusion.

The blur SDE is diagonal in DCT space: its transition Psi(s,t) and eps
integrand are per-frequency scalars (H, W, 1) rather than CLD's 2x2 blocks
(gddim_tpu/math/blur.py). The reference ships a scalar Adams-Bashforth
builder but never wires it to a sampler (blur_jax/multistep.py is dead code,
and blur sampling supports only order0, blur_jax/sampling.py:30-39).

Here the scalar AB machinery is implemented against the BlurSDE protocol and
wired to a working higher-order frequency-space DEIS sampler — each AB
coefficient is an (H, W, 1) map:

    C_j^{(i)} = int_{t_i}^{t_{i+1}} Psi(tau, t_{i+1}) E(tau) L_j(tau) dtau.

Computed with the same left-endpoint quadrature as the 2x2 engine
(gddim_tpu/math/deis.py), vectorized over frequencies.
"""

from __future__ import annotations

import numpy as np

from gddim_tpu.math.deis import lagrange_basis


def _schedule_eps_integrand(sde, taus: np.ndarray) -> np.ndarray:
    """Exact per-frequency eps integrand E(tau) = s'(tau) - (m'/m)(tau) s(tau).

    Derived from the forward marginals y_t = m(t) y_0 + s(t) eps themselves
    (m = y_mean_coef per frequency, s = y_std_coef): with this E,
    int psi(tau,t') E(tau) dtau == s(t') - psi(t,t') s(t) holds exactly, i.e.
    order-0 DEIS reduces to the DDIM update. NOTE: the reference's
    G/eps_integrand (blur_jax/sde_lib.py:58-77, feeding its dead multistep
    module) is NOT consistent with its own (m, s) schedule — it drops the
    frequency-damping drift D'/D term — so we derive E from the schedule
    rather than porting that formula. Derivatives via float64 central
    differences (schedule-agnostic).
    """
    labda = np.asarray(sde.labda, dtype=np.float64)[0]  # (H, W, 1)
    taus = np.asarray(taus, dtype=np.float64)

    def alpha(t):
        return np.cos((t + 0.004) / 1.008 * np.pi / 2) ** 2

    def d_freq(t):  # (n, H, W, 1)
        sigma_blur = sde.sigma_blur_max * np.sin(t * np.pi / 2) ** 2
        diss = (sigma_blur**2 / 2)[:, None, None, None]
        return np.exp(-diss * labda[None]) * (1 - sde.min_scale) + sde.min_scale

    def m_fn(t):
        return np.sqrt(alpha(t))[:, None, None, None] * d_freq(t)

    def s_fn(t):
        return np.sqrt(1 - alpha(t))

    h = 1e-7  # float64 central differences
    m = m_fn(taus)
    dm = (m_fn(taus + h) - m_fn(taus - h)) / (2 * h)
    s = s_fn(taus)
    ds = (s_fn(taus + h) - s_fn(taus - h)) / (2 * h)
    return ds[:, None, None, None] - dm / m * s[:, None, None, None]


def _freq_core(
    sde, t_start: float, t_end: float, n_quad: int, reference_exact: bool = False
):
    """Psi(tau, t_end) * E(tau) * dtau over the quadrature grid -> (n, H, W, 1).

    ``reference_exact`` swaps the schedule-derived integrand for the
    reference's own G-based formula (blur_jax/sde_lib.py:58-77; it drops the
    frequency-damping D'/D drift term — see _schedule_eps_integrand's note).
    """
    import jax.numpy as jnp

    taus = t_start + (t_end - t_start) * np.arange(n_quad) / n_quad
    dt = (t_end - t_start) / n_quad
    taus_j = jnp.asarray(taus)
    # psi(tau_k, t_end): ratio formulation, (n, H, W, 1)
    psi = np.asarray(sde.psi(taus_j, jnp.full_like(taus_j, t_end)), dtype=np.float64)
    if reference_exact:
        integrand = np.asarray(sde.eps_integrand(taus_j), dtype=np.float64)
    else:
        integrand = _schedule_eps_integrand(sde, taus)
    return psi * integrand * dt, taus


def blur_ab_eps_coef(
    sde,
    rev_ts: np.ndarray,
    order: int,
    n_quad: int = 2000,
    reference_exact: bool = False,
) -> np.ndarray:
    """Scalar AB eps coefficients [N, order+1, H, W, 1] with warm-up."""
    rev_ts = np.asarray(rev_ts, dtype=np.float64)
    n_steps = len(rev_ts) - 1
    shape = np.asarray(sde.labda).shape[1:]  # (H, W, 1)
    out = np.zeros((n_steps, order + 1) + shape, dtype=np.float64)
    for i in range(n_steps):
        o = min(i, order)
        core, taus = _freq_core(sde, rev_ts[i], rev_ts[i + 1], n_quad, reference_exact)
        support = rev_ts[i - o : i + 1][::-1]
        for j in range(o + 1):
            w = lagrange_basis(taus, support, j)
            out[i, j] = np.einsum("n,nhwc->hwc", w, core)
    return out


def blur_deis_coef(
    sde,
    rev_ts: np.ndarray,
    order: int,
    n_quad: int = 2000,
    reference_exact: bool = False,
):
    """(x_coef [N,H,W,1], eps_coef [N,order+1,H,W,1]) stacks."""
    import jax.numpy as jnp

    rev_ts = np.asarray(rev_ts, dtype=np.float64)
    ts = jnp.asarray(rev_ts)
    x_coef = np.asarray(sde.psi(ts[:-1], ts[1:]), dtype=np.float64)
    eps_coef = blur_ab_eps_coef(sde, rev_ts, order, n_quad, reference_exact)
    return x_coef, eps_coef
