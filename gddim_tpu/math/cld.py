"""Device-side CLD schedule (JAX pytree).

Everything a jitted training/sampling step needs from the CLD SDE, packaged as
a flax.struct pytree so it can be closed over or passed through `jax.jit`:

- closed-form transition Psi(s, t)                  (cld_jax/sde_lib.py:182-205)
- R(t) via a uniform-grid f32 table + linear interp (cld_jax/sde_lib.py:93-118)
- full-covariance forward perturbation              (cld_jax/sde_lib.py:261-268)
- prior sampling x~N(0,1), v~N(0,1/m)               (cld_jax/sde_lib.py:270-274)
- eps -> score conversion  score = -R^{-T} eps      (cld_jax/sde_lib.py:246-253)

TPU-first details: the R table sits on a *uniform* grid so lookup is index
arithmetic plus one gather (no searchsorted); all 2x2 coefficient math is f32
and fuses into the surrounding elementwise graph.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.linalg2 import bmm, inv2, mat2


@flax.struct.dataclass
class CLD:
    # static hyperparameters (hashable aux data; retraces only if they change)
    m_inv: float = flax.struct.field(pytree_node=False)
    beta_0: float = flax.struct.field(pytree_node=False)
    beta_1: float = flax.struct.field(pytree_node=False)
    gamma: float = flax.struct.field(pytree_node=False)
    vv_gamma: float = flax.struct.field(pytree_node=False)
    numerical_eps: float = flax.struct.field(pytree_node=False)
    T: float = flax.struct.field(pytree_node=False)
    sampling_eps: float = flax.struct.field(pytree_node=False)
    mixed_score: bool = flax.struct.field(pytree_node=False)
    # R(t) interpolation table on a uniform grid over [0, t_max]
    r_table: jnp.ndarray  # (n, 2, 2) float32
    r_t_max: float = flax.struct.field(pytree_node=False)

    # --- construction -------------------------------------------------------
    @classmethod
    def create(
        cls,
        params: CLDParams = CLDParams(),
        mixed_score: bool = False,
        table_size: int = 32768,
    ) -> "CLD":
        host = HostCLD(params)
        ts, rs = host.r_table(n=table_size)
        return cls(
            m_inv=params.m_inv,
            beta_0=params.beta_0,
            beta_1=params.beta_1,
            gamma=params.gamma,
            vv_gamma=params.vv_gamma,
            numerical_eps=params.numerical_eps,
            T=params.T,
            sampling_eps=params.sampling_eps,
            mixed_score=mixed_score,
            r_table=jnp.asarray(rs),
            r_t_max=float(ts[-1]),
        )

    @classmethod
    def from_config(cls, config) -> "CLD":
        return cls.create(
            CLDParams.from_config(config),
            mixed_score=bool(config.model.mixed_score),
        )

    # --- schedule -------------------------------------------------------------
    def beta(self, t):
        return self.beta_0 + self.beta_1 * t

    def beta_int(self, t):
        return self.beta_0 * t + 0.5 * self.beta_1 * t**2

    def F(self, t):
        b = self.beta(t)
        z = jnp.zeros_like(b)
        return mat2(z, b * self.m_inv, -b, -self.gamma * b * self.m_inv, xp=jnp)

    def G(self, t):
        b = self.beta(t)
        z = jnp.zeros_like(b)
        return mat2(z, z, z, jnp.sqrt(2.0 * self.gamma * b), xp=jnp)

    def psi(self, s, t):
        tau = self.beta_int(t) - self.beta_int(s)
        a = 2.0 * jnp.sqrt(self.m_inv)
        coef = jnp.exp(-a * tau / 2.0)
        one = jnp.ones_like(tau)
        m = mat2(
            one + a * tau / 2.0, 0.25 * a * a * tau, -tau, one - a * tau / 2.0, xp=jnp
        )
        return m * coef[..., None, None]

    # --- R(t) -------------------------------------------------------------
    def R(self, t):
        """R(t) for scalar or batched t via uniform-grid linear interpolation."""
        n = self.r_table.shape[0]
        h = self.r_t_max / (n - 1)
        t = jnp.clip(t, 0.0, self.r_t_max)
        pos = t / h
        idx = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
        frac = pos - idx.astype(pos.dtype)
        lo = self.r_table[idx]
        hi = self.r_table[idx + 1]
        return lo + frac[..., None, None] * (hi - lo)

    def invR(self, t):
        return inv2(self.R(t))

    def cov(self, t):
        r = self.R(t)
        return r @ r.swapaxes(-1, -2)

    # --- forward process -----------------------------------------------------
    def mean(self, batch, ts):
        """Psi(0, t_b) applied per batch element; batch (B, ..., d, 2)."""
        psis = self.psi(jnp.zeros_like(ts), ts)  # (B, 2, 2)
        return bmm(psis, batch)

    def perturb_data(self, batch, ts, rng):
        """Full-covariance forward sampling: mean + R(t) z, z ~ N(0, I)."""
        mean = self.mean(batch, ts)
        rs = self.R(ts)  # (B, 2, 2)
        raw_noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        perturbed = mean + bmm(rs, raw_noise)
        return perturbed, mean, raw_noise

    def prior_sampling(self, rng, shape, dtype=jnp.float32):
        x_rng, v_rng = jax.random.split(rng)
        xs = jax.random.normal(x_rng, shape, dtype=dtype)
        vs = jax.random.normal(v_rng, shape, dtype=dtype) / jnp.sqrt(self.m_inv)
        return jnp.stack([xs, vs], axis=-1)

    # --- eps <-> score ---------------------------------------------------------
    def eps2score(self, eps, ts):
        """score = -R(t)^{-T} eps, per batch element."""
        inv_rs = inv2(self.R(ts))  # (B, 2, 2)
        return jnp.einsum(
            "bji,b...dj->b...di", -inv_rs, eps, precision=jax.lax.Precision.HIGHEST
        )

    def host(self) -> HostCLD:
        """Float64 host-side twin (for coefficient precompute)."""
        return HostCLD(
            CLDParams(
                m_inv=self.m_inv,
                beta_0=self.beta_0,
                beta_1=self.beta_1,
                vv_gamma=self.vv_gamma,
                numerical_eps=self.numerical_eps,
                T=self.T,
                sampling_eps=self.sampling_eps,
            )
        )
