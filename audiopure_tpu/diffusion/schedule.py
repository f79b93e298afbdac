"""DDPM schedule math as pure JAX.

TPU-native rebuild of the reference's schedule utilities
(``diffusion_models/DiffWave_Unconditional/util.py:68-123``): all tables are
computed once at trace time as f32 constants, so inside ``jit`` they fold into
the compiled program; the per-step lookups in the reverse loops become gathers
on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Beta/Alpha/Alpha_bar/Sigma tables for a linear-beta DDPM.

    Mirrors the dict returned by ``calc_diffusion_hyperparams``
    (reference ``util.py:96-123``); Sigma = sqrt(beta_tilde).
    """

    T: int
    beta: jnp.ndarray        # (T,)
    alpha: jnp.ndarray       # (T,)
    alpha_bar: jnp.ndarray   # (T,)
    sigma: jnp.ndarray       # (T,)

    @property
    def sqrt_alpha_bar(self) -> jnp.ndarray:
        return jnp.sqrt(self.alpha_bar)

    @property
    def sqrt_one_minus_alpha_bar(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alpha_bar)


def make_schedule(T: int, beta_0: float, beta_T: float) -> DiffusionSchedule:
    """Linear beta schedule; beta_tilde_t = beta_t*(1-abar_{t-1})/(1-abar_t).

    Computed in float64 numpy then cast, so the cumulative products match the
    reference's sequential fp32 loop to ~1e-7.
    """
    beta = np.linspace(beta_0, beta_T, T, dtype=np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    beta_tilde = beta.copy()
    beta_tilde[1:] = beta[1:] * (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:])
    sigma = np.sqrt(beta_tilde)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        T=T, beta=f32(beta), alpha=f32(alpha), alpha_bar=f32(alpha_bar),
        sigma=f32(sigma),
    )


def diffusion_step_embedding(diffusion_steps: jnp.ndarray,
                             embed_dim_in: int = 128) -> jnp.ndarray:
    """Sinusoidal timestep embedding.

    [sin(t*10^(0*4/63)), ..., sin(t*10^(63*4/63)), cos(...), ...] —
    reference ``util.py:68-93``. ``diffusion_steps``: (B, 1) float or int.

    Returns (B, embed_dim_in) float32.
    """
    assert embed_dim_in % 2 == 0
    half = embed_dim_in // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1))
    )
    args = diffusion_steps.astype(jnp.float32) * freq[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
