"""Blurring-diffusion SDE (Hoogeboom & Salimans) — device pytree.

Reference: blur_jax/sde_lib.py. The forward process scales DCT-frequency
components with a dissipation-dependent damping D(t) on top of a cosine ᾱ(t)
schedule, plus isotropic pixel noise; sampling runs DDIM-style order-0 updates
entirely in DCT space. All "matrices" are per-frequency scalars, so the
structured-linear-operator here is a (H, W, 1) map rather than CLD's 2x2.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu.math.dct import batch_img_dct, batch_img_idct


def batch_mul(a, b):
    """Per-batch broadcast multiply (reference blur_jax/sde_lib.py:8-10)."""
    return jax.vmap(lambda x, y: x * y)(a, b)


def linear_t2alpha_fn(t):
    """Linear-beta VP schedule (reference :13-16; used by ablation losses)."""
    beta_0, beta_1 = 0.01, 20
    log_mean_coef = -0.25 * t**2 * (beta_1 - beta_0) - 0.5 * t * beta_0
    return jnp.exp(2 * log_mean_coef)


@flax.struct.dataclass
class BlurSDE:
    min_scale: float = flax.struct.field(pytree_node=False, default=0.001)
    sigma_blur_max: float = flax.struct.field(pytree_node=False, default=10.0)
    sampling_eps: float = flax.struct.field(pytree_node=False, default=1e-5)
    img_dim: int = flax.struct.field(pytree_node=False, default=32)

    @property
    def T(self) -> float:
        return 1.0

    @property
    def labda(self):
        """Per-frequency dissipation rates (1, H, W, 1) (reference :24-27)."""
        n = self.img_dim
        freqs = np.pi * np.linspace(0, n - 1, n) / n
        lab = freqs[None, :, None, None] ** 2 + freqs[None, None, :, None] ** 2
        return jnp.asarray(lab)

    @property
    def alpha_start(self):
        return self.t2alpha_fn(0.0)

    @property
    def sampling_T(self):
        """EDM-style start time rho2t(80) (reference :33-35,47-51)."""
        return float(self.rho2t(80.0))

    # --- schedule ---------------------------------------------------------
    def t2alpha_fn(self, t):
        return jnp.cos((t + 0.004) / 1.008 * jnp.pi / 2) ** 2

    def alpha2t_fn(self, alpha):
        return jnp.arccos(jnp.sqrt(alpha)) * 2 / jnp.pi * 1.008 - 0.004

    def dalpha_dt_fn(self, t):
        """d alpha / dt of the cosine schedule (analytic)."""
        inner = (t + 0.004) / 1.008 * jnp.pi / 2
        return -2.0 * jnp.cos(inner) * jnp.sin(inner) * (jnp.pi / 2 / 1.008)

    def rho2t(self, rho):
        num = self.alpha_start
        denum = (rho + jnp.sqrt(1 - self.alpha_start)) ** 2 + self.alpha_start
        return self.alpha2t_fn(num / denum)

    # --- frequency scaling -------------------------------------------------
    def get_frequency_scaling(self, t):
        """D(t): (B, H, W, 1) damping per frequency (reference :79-88)."""
        t = jnp.atleast_1d(t)
        sigma_blur = self.sigma_blur_max * jnp.sin(t * jnp.pi / 2) ** 2
        dissipation_time = sigma_blur**2 / 2
        logits = dissipation_time[:, None, None, None] * self.labda
        return jnp.exp(-logits) * (1 - self.min_scale) + self.min_scale

    def psi(self, t_start, t_end):
        """Frequency-space transition ratio (reference :53-56)."""
        alpha_ratio = jnp.sqrt(
            self.t2alpha_fn(t_end) / self.t2alpha_fn(t_start)
        )
        scaling_ratio = self.get_frequency_scaling(
            jnp.atleast_1d(t_end)
        ) / self.get_frequency_scaling(jnp.atleast_1d(t_start))
        return batch_mul(jnp.atleast_1d(alpha_ratio), scaling_ratio)

    def G(self, ts):
        """Per-frequency diffusion coefficient (reference :58-70)."""
        ts = jnp.atleast_1d(ts)
        dalpha_dt = self.dalpha_dt_fn(ts)
        alpha_t = self.t2alpha_fn(ts)
        d_t = self.get_frequency_scaling(ts)
        return jnp.sqrt(
            batch_mul(dalpha_dt, (-1.0 + batch_mul(1 - 1.0 / alpha_t, d_t)))
        )

    def eps_integrand(self, vec_t):
        """(1/2) G^2 / sqrt(1-alpha) per frequency (reference :72-77)."""
        vec_t = jnp.atleast_1d(vec_t)
        g = self.G(vec_t)
        return batch_mul(0.5 * g * g, 1.0 / jnp.sqrt(1 - self.t2alpha_fn(vec_t)))

    # --- DCT-space mean/std -------------------------------------------------
    def y_mean_coef(self, ts):
        freq_scaling = self.get_frequency_scaling(ts)
        alphas = self.t2alpha_fn(ts)
        return batch_mul(jnp.sqrt(alphas), freq_scaling)

    def y_std_coef(self, ts):
        return jnp.sqrt(1 - self.t2alpha_fn(ts))

    # --- forward process -------------------------------------------------------
    def perturb_data(self, batch, ts, rng, noise_ratio=1.0):
        """DCT -> scale -> iDCT -> + isotropic noise (reference :99-110)."""
        eps = jax.random.normal(rng, batch.shape, dtype=batch.dtype)
        ys = batch_img_dct(batch)
        mean = batch_img_idct(batch_mul(self.y_mean_coef(ts), ys))
        x_t = mean + batch_mul(self.y_std_coef(ts), eps) * noise_ratio
        return x_t, mean, eps

    def cos_perturb_data(self, batch, ts, rng, noise_ratio=1.0):
        """Plain (no blur) cosine-schedule perturbation (reference :112-121)."""
        eps = jax.random.normal(rng, batch.shape, dtype=batch.dtype)
        alpha = self.t2alpha_fn(ts)
        mean = batch_mul(jnp.sqrt(alpha), batch)
        x_t = mean + batch_mul(jnp.sqrt(1 - alpha), eps) * noise_ratio
        return x_t, mean, eps

    def linear_perturb_data(self, batch, ts, rng, noise_ratio=1.0):
        eps = jax.random.normal(rng, batch.shape, dtype=batch.dtype)
        alpha = linear_t2alpha_fn(ts)
        mean = batch_mul(jnp.sqrt(alpha), batch)
        x_t = mean + batch_mul(jnp.sqrt(1 - alpha), eps) * noise_ratio
        return x_t, mean, eps

    def prior_sampling(self, rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype=dtype)

    def sample_t(self, shape, rng):
        return jax.random.uniform(rng, shape, minval=1e-5, maxval=self.T)

    # --- pixel <-> frequency -----------------------------------------------
    def x2y(self, xs):
        return batch_img_dct(xs)

    def y2x(self, ys):
        return batch_img_idct(ys)

    # --- model adapter hooks (reference :146-163) ---------------------------
    def encode_t(self, t):
        return 999 * t

    def encode_x(self, xs):
        return xs

    def model2eps(self, xs, ts, model_output):
        del xs, ts
        return model_output

    def xeps2x0(self, xt, ts, xeps):
        xt_clean_pred = xt - batch_mul(jnp.sqrt(1 - self.t2alpha_fn(ts)), xeps)
        yt = self.x2y(xt_clean_pred)
        y0 = 1.0 / self.y_mean_coef(ts) * yt
        return self.y2x(y0)


def from_config(config) -> BlurSDE:
    return BlurSDE(
        min_scale=float(getattr(config.model, "min_scale", 0.001)),
        sigma_blur_max=float(config.model.sigma_blur_max),
        sampling_eps=float(config.sampling.t0),
        img_dim=int(config.data.image_size),
    )
