"""Independent re-run of the REFERENCE coefficient pipeline (golden oracle).

This module re-implements, from the algorithm (not the code), exactly what the
reference computes for the gDDIM sampler coefficients — including its
discretization quirks — so tests can assert our production engine
(gddim_tpu/math/{cld_host,deis}.py) reproduces the reference numerics:

- R(t) by a *fixed-step* scan from R_0 over the grid
  ``linspace(0, 1+dt, int(1/dt)+1, endpoint=False)`` with either the
  Euler-midpoint update (reference default, dt=1e-5) or the classic RK4
  update (release config accr_dcifar10, dt=1e-6), where the midpoint variant
  averages F and G at (t, t+dt) — cld_jax/sde_lib.py:93-118, deis.py:5-17.
- the reference then *subsamples* the scan output at
  ``linspace(0, n-1, 100_000, dtype=int)`` indices and linearly interpolates
  with searchsorted — sde_lib.py:32-43,116-118. We reproduce that too (it
  matters at the ~1e-7 level).
- eps integrand 0.5 G G^T R^{-T} through the interpolated R — sde_lib.py:208-212.
- per-step quadrature: 10,000-point left-endpoint rule on
  ``linspace(t_i, t_{i+1}, n, endpoint=False)`` of Psi(tau, t_{i+1}) E(tau)
  times the Lagrange basis over the step's support points — deis.py:19-59.
- the recursive Adams-Bashforth warm-up: step i uses effective order
  min(i, order) with support [t_i, ..., t_{i-o}] and row j holding the weight
  for eps at t_{i-j}, zero-padded to width ``highest_order+1`` — deis.py:61-95.
- the stack layout [Psi | eps rows] of get_deis_coef — sde_lib.py:308-319.

The scan runs as jax.lax.scan on CPU inside an enable_x64 context (the
reference runs x32 by default and x64 for the release config; both are
exposed). Everything else is numpy float64.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import enable_x64


def _scan_R(m_inv, beta_0, beta_1, vv_gamma, numerical_eps, is_rk, r_dt, x64):
    """Fixed-step R(t) scan exactly as the reference integrates it."""
    gamma = 2.0 / np.sqrt(m_inv)
    n = int(1.0 / r_dt) + 1

    def F(t):
        b = beta_0 + beta_1 * t
        return jnp.array([[0.0, b * m_inv], [-b, -gamma * b * m_inv]])

    def G(t):
        b = beta_0 + beta_1 * t
        return jnp.array([[0.0, 0.0], [0.0, jnp.sqrt(2.0 * gamma * b)]])

    def rhs(r, t):
        return F(t) @ r + 0.5 * G(t) @ G(t).T @ jnp.linalg.inv(r).T

    def body(r, t):
        if is_rk:
            # classic RK4 (reference deis.py:5-17)
            k1 = rhs(r, t)
            k2 = rhs(r + k1 * r_dt / 2, t + r_dt / 2)
            k3 = rhs(r + k2 * r_dt / 2, t + r_dt / 2)
            k4 = rhs(r + k3 * r_dt, t + r_dt)
            new = r + r_dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        else:
            # Euler with midpoint-averaged F, G; note the reference uses
            # G_mid @ G_mid (not G G^T) here — identical for this diagonal G
            f_mid = (F(t) + F(t + r_dt)) / 2.0
            g_mid = (G(t) + G(t + r_dt)) / 2.0
            new = r + r_dt * (f_mid @ r + 0.5 * g_mid @ g_mid @ jnp.linalg.inv(r).T)
        return new, r  # scan collects the value *entering* each step

    def run():
        # created inside the x64 context so dtypes match the reference's mode
        ts = jnp.linspace(0.0, 1.0 + r_dt, n, endpoint=False)
        r0 = jnp.array(
            [
                [np.sqrt(numerical_eps), 0.0],
                [0.0, np.sqrt(vv_gamma / m_inv + numerical_eps)],
            ],
            dtype=ts.dtype,
        )
        scan = jax.jit(lambda: jax.lax.scan(body, r0, ts)[1])
        rs = scan()
        return np.asarray(ts, np.float64), np.asarray(rs, np.float64)

    if x64:
        with enable_x64():
            return run()
    return run()


class RefCLDShim:
    """Duck-typed CLD oracle with the reference's interpolated R(t)."""

    def __init__(
        self,
        m_inv=4.0,
        beta_0=4.0,
        beta_1=0.0,
        vv_gamma=0.04,
        numerical_eps=1e-6,
        is_R_rk=False,
        R_dt=1e-5,
        x64=False,
    ):
        self.m_inv = m_inv
        self.beta_0 = beta_0
        self.beta_1 = beta_1
        self.gamma = 2.0 / np.sqrt(m_inv)
        ts, rs = _scan_R(
            m_inv, beta_0, beta_1, vv_gamma, numerical_eps, is_R_rk, R_dt, x64
        )
        # the reference's 100k-point subsample before interpolation
        idx = np.linspace(0, rs.shape[0] - 1, 100_000).astype(int)
        self._xp = ts[idx]
        self._fp = rs[idx]

    # --- reference-style searchsorted linear interpolation ------------------
    def s_R(self, t):
        t = np.asarray(t, dtype=np.float64)
        i = np.clip(np.searchsorted(self._xp, t, side="right"), 1, len(self._xp) - 1)
        df = self._fp[i] - self._fp[i - 1]
        dx = (self._xp[i] - self._xp[i - 1])[..., None, None]
        delta = (t - self._xp[i - 1])[..., None, None]
        return np.where(dx == 0, self._fp[i], self._fp[i - 1] + delta / dx * df)

    def beta_int(self, t):
        t = np.asarray(t, dtype=np.float64)
        return self.beta_0 * t + 0.5 * self.beta_1 * t**2

    def vs_psi(self, s, t):
        """Closed-form transition (sde_lib.py:182-205), vectorized over s."""
        tau = self.beta_int(t) - self.beta_int(s)
        a = 2.0 * np.sqrt(self.m_inv)
        coef = np.exp(-a * tau / 2.0)
        one = np.ones_like(tau)
        m = np.stack(
            [
                np.stack([one + a * tau / 2.0, 0.25 * a * a * tau], -1),
                np.stack([-tau, one - a * tau / 2.0], -1),
            ],
            -2,
        )
        return m * coef[..., None, None]

    def v_eps_integrand(self, t):
        t = np.asarray(t, dtype=np.float64)
        b = self.beta_0 + self.beta_1 * t
        z = np.zeros_like(b)
        g = np.stack(
            [
                np.stack([z, z], -1),
                np.stack([z, np.sqrt(2.0 * self.gamma * b)], -1),
            ],
            -2,
        )
        inv_r = np.linalg.inv(self.s_R(t))
        return 0.5 * (g @ np.swapaxes(g, -1, -2)) @ np.swapaxes(inv_r, -1, -2)


def _lagrange(taus, support, j):
    """L_j over support, with the reference's self-term masking (deis.py:30-38)."""
    num = taus[:, None] - support[None, :]
    den = support[j] - support
    num[:, j] = 1.0
    den = den.copy()
    den[j] = 1.0
    return np.prod(num, axis=1) / np.prod(den)


def _single_eps_coef(shim, t_start, t_end, support, j, n_quad=10_000):
    taus = np.linspace(t_start, t_end, n_quad, endpoint=False)
    dt = (t_end - t_start) / n_quad
    core = np.einsum(
        "nij,njk->nik", shim.vs_psi(taus, t_end), shim.v_eps_integrand(taus)
    )
    w = _lagrange(taus, support, j)
    return np.einsum("n,nij->ij", w, core) * dt


def ref_ab_eps_coef(shim, highest_order, timesteps, order, n_quad=10_000):
    """The reference's recursive AB builder (deis.py:61-95), row width
    highest_order+1, row j = weight for eps at t_{i-j}."""
    timesteps = np.asarray(timesteps, dtype=np.float64)
    if order == 0:
        out = np.zeros((len(timesteps) - 1, highest_order + 1, 2, 2))
        for i in range(len(timesteps) - 1):
            support = timesteps[i : i + 1]
            out[i, 0] = _single_eps_coef(
                shim, timesteps[i], timesteps[i + 1], support, 0, n_quad
            )
        return out
    prev = ref_ab_eps_coef(shim, highest_order, timesteps[: order + 1], order - 1, n_quad)
    n_cur = len(timesteps) - order - 1
    cur = np.zeros((n_cur, highest_order + 1, 2, 2))
    for k in range(n_cur):
        support = timesteps[k : k + order + 1]  # ascending [t_{i-order}..t_i]
        t_start, t_end = timesteps[k + order], timesteps[k + order + 1]
        # reference row j corresponds to coef_idx = flip(arange)[j] = order - j
        for j in range(order + 1):
            cur[k, j] = _single_eps_coef(
                shim, t_start, t_end, support, order - j, n_quad
            )
    return np.concatenate([prev, cur], axis=0)


def ref_deis_coef(shim, order, rev_ts, n_quad=10_000):
    """get_deis_coef stack [N, order+3, 2, 2] (sde_lib.py:308-319)."""
    rev_ts = np.asarray(rev_ts, dtype=np.float64)
    x_coef = shim.vs_psi(rev_ts[:-1], rev_ts[1:])
    eps_coef = ref_ab_eps_coef(shim, order + 1, rev_ts, order, n_quad)
    return np.concatenate([x_coef[:, None], eps_coef], axis=1)


def ref_rev_ts(T, sampling_eps, ts_order, num_step):
    """Power-law grid (sampling.py:241-249)."""
    return (
        np.linspace(T ** (1.0 / ts_order), sampling_eps ** (1.0 / ts_order), num_step + 1)
        ** ts_order
    )


class RefMLShim:
    """MLCLD oracle: the rotated y-space the mldeis sampler integrates in
    (sampling.py:272-326). psi2 is tabulated by the reference's fixed-step
    RK4 scan (N=100,000 steps of dt=1/N from t=0, collecting the value
    ENTERING each step — get_ml_psi2_fn, sampling.py:272-284) and linearly
    interpolated with searchsorted, exactly like R(t)."""

    def __init__(self, base: RefCLDShim, n_steps: int = 100_000):
        assert base.beta_1 == 0.0  # reference MLCLD assertion
        self.base = base
        N = n_steps
        dt = 1.0 / N
        ts = np.empty(N + 1)
        vals = np.empty((N + 1, 2, 2))
        psi2 = np.eye(2)
        t = 0.0

        def fn(p, tau):
            return self.s_inv_psi1(tau) @ self.s_F2(tau) @ self.s_psi1(tau) @ p

        for i in range(N + 1):
            ts[i] = t
            vals[i] = psi2
            k1 = fn(psi2, t)
            k2 = fn(psi2 + k1 * dt / 2, t + dt / 2)
            k3 = fn(psi2 + k2 * dt / 2, t + dt / 2)
            k4 = fn(psi2 + k3 * dt, t + dt)
            psi2 = psi2 + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            t += dt
        self._xp = ts
        self._fp = vals

    # closed-form rotation (sde_lib.py:121-155)
    def _f1_psi(self, s, t):
        bi = self.base.beta_int(t) - self.base.beta_int(s)
        inv_sqrt_m = np.sqrt(self.base.m_inv)
        sqrt_m = 1.0 / inv_sqrt_m
        c, s_ = np.cos(bi * inv_sqrt_m), np.sin(bi * inv_sqrt_m)
        return np.array([[c, inv_sqrt_m * s_], [-sqrt_m * s_, c]])

    def s_psi1(self, t):
        return self._f1_psi(0.0, t)

    def s_inv_psi1(self, t):
        return self._f1_psi(t, 0.0)

    def s_F2(self, t):
        b = self.base.beta_0 + self.base.beta_1 * t
        gamma = self.base.gamma
        return np.array([[0.0, 0.0], [0.0, -gamma * b * self.base.m_inv]])

    def _psi2(self, t):
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        i = np.clip(np.searchsorted(self._xp, t, side="right"), 1, len(self._xp) - 1)
        dx = (self._xp[i] - self._xp[i - 1])[..., None, None]
        delta = (t - self._xp[i - 1])[..., None, None]
        return self._fp[i - 1] + delta / dx * (self._fp[i] - self._fp[i - 1])

    def vs_psi(self, s, t):
        """psi2(t) @ psi2(s)^-1 over a vector of s (sampling.py:315-317)."""
        s = np.atleast_1d(np.asarray(s, dtype=np.float64))
        p_t = self._psi2(float(np.asarray(t)))[0]
        p_s = self._psi2(s)
        return p_t @ np.linalg.inv(p_s)

    def v_eps_integrand(self, t):
        """0.5 psi1^{-1} G Gᵀ R^{-T} (sampling.py:319-326)."""
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        b = self.base.beta_0 + self.base.beta_1 * t
        g2 = 2.0 * self.base.gamma * b
        inv_r_t = np.swapaxes(np.linalg.inv(self.base.s_R(t)), -1, -2)
        inv_psi1 = np.stack([self.s_inv_psi1(ti) for ti in t])
        gg = np.zeros((len(t), 2, 2))
        gg[:, 1, 1] = g2
        return 0.5 * inv_psi1 @ gg @ inv_r_t


def ref_mldeis_coef(shim: RefMLShim, order: int, rev_ts, n_quad=10_000):
    """MLCLD.get_deis_coef stack [N, order+3, 2, 2] (sampling.py:348-352)."""
    rev_ts = np.asarray(rev_ts, dtype=np.float64)
    # x_coef pairs: psi(s_k, t_k) per step (vs_psi takes vector-s, scalar-t)
    x_coef = np.stack(
        [shim.vs_psi(np.array([s]), t)[0] for s, t in zip(rev_ts[:-1], rev_ts[1:])]
    )
    eps_coef = ref_ab_eps_coef(shim, order + 1, rev_ts, order, n_quad)
    return np.concatenate([x_coef[:, None], eps_coef], axis=1)
