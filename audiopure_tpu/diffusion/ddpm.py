"""DiffWave DDPM purifier: q-sample forward, ancestral reverse as lax.scan.

TPU-native rebuild of ``diffusion_models/diffwave_ddpm.py:16-249``:

* ``diffuse``      — q(x_t | x_0) jump to step t            (ref ``:49-73``)
* ``reverse``      — t-step ancestral loop                  (ref ``:75-104``)
* ``fast_reverse`` — 3-step respaced reverse                (ref ``:106-141``)
* ``one_shot_denoise`` / ``two_shot_denoise``               (ref ``:174-193``)
* ``sample``       — full-T unconditional generation        (ref ``util.py:126-158``)

The reference wraps its DDPM forward in ``torch.no_grad`` (``:41``), making
the DDPM path non-differentiable by construction; we expose
``stop_score_grad`` so both that behaviour and full differentiation (for
stronger adaptive attacks) are available. Every Python loop in the reference
becomes a ``lax.scan`` over the step index, so the purifier is one compiled
program regardless of t.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.diffusion.schedule import DiffusionSchedule


class DDPMPurifier:
    """Waveform purifier around an epsilon-net.

    Args:
      eps_fn: ``eps_fn(x, steps)`` with x ``(B, 1, L)``, steps ``(B, 1)``
        float32 -> epsilon ``(B, 1, L)`` (a bound flax apply).
      schedule: DDPM tables.
      reverse_timestep: t* — how far to noise and how many steps to denoise.
      stop_score_grad: mimic the reference's ``torch.no_grad`` purifier
        forward (``diffwave_ddpm.py:41``) by blocking gradients through the
        score net; set False for a fully differentiable purifier.
      remat: apply ``jax.checkpoint`` per reverse step so grad-through-scan
        holds O(1) activations per step instead of the whole WaveNet.
    """

    def __init__(
        self,
        eps_fn: Callable,
        schedule: DiffusionSchedule,
        reverse_timestep: int = 200,
        stop_score_grad: bool = True,
        remat: bool = True,
    ):
        from audiopure_tpu.utils.grads import nondifferentiable

        # the reference wraps its purifier forward in torch.no_grad
        # (``diffwave_ddpm.py:41``); opaque wrapping (not just
        # stop_gradient) lets non-differentiable kernels run under grad
        self.eps_fn = nondifferentiable(eps_fn) if stop_score_grad \
            else eps_fn
        self.schedule = schedule
        self.reverse_timestep = int(reverse_timestep)
        self.stop_score_grad = stop_score_grad
        self.remat = remat

    # -- q(x_t | x_0) -------------------------------------------------------
    def diffuse(self, x0: jnp.ndarray, key: jax.Array,
                t: Optional[int] = None) -> jnp.ndarray:
        """Jump to step t: x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) z."""
        t = self.reverse_timestep if t is None else t
        abar = self.schedule.alpha_bar[t - 1]
        z = jax.random.normal(key, x0.shape, dtype=x0.dtype)
        return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * z

    # -- single reverse-step coefficients ------------------------------------
    def _eps(self, x, t_scalar):
        steps = jnp.full((x.shape[0], 1), t_scalar, dtype=jnp.float32)
        return self.eps_fn(x, steps)  # opaque-wrapped when stop_score_grad

    def compute_coefficients(self, x_t, t_scalar):
        """eps, mu_theta, sigma_theta at step t (ref ``:143-164``)."""
        sched = self.schedule
        eps = self._eps(x_t, t_scalar)
        alpha_t = sched.alpha[t_scalar]
        abar_t = sched.alpha_bar[t_scalar]
        mu = (x_t - (1.0 - alpha_t) / jnp.sqrt(1.0 - abar_t) * eps) \
            / jnp.sqrt(alpha_t)
        sigma = sched.sigma[t_scalar]
        return eps, mu, sigma

    # -- t-step ancestral reverse as a scan ----------------------------------
    def reverse(self, x_t: jnp.ndarray, key: jax.Array,
                t: Optional[int] = None) -> jnp.ndarray:
        """Ancestral reverse from step t down to 0 (ref ``:75-104``)."""
        t = self.reverse_timestep if t is None else t

        def step(carry, inp):
            x = carry
            t_idx, step_key = inp
            _, mu, sigma = self.compute_coefficients(x, t_idx)
            z = jax.random.normal(step_key, x.shape, dtype=x.dtype)
            # noise only for t > 0 (ref ``:99-102``)
            x_next = jnp.where(t_idx > 0, mu + sigma * z, mu)
            return x_next, None

        if self.remat:
            step = jax.checkpoint(step)

        t_indices = jnp.arange(t - 1, -1, -1)
        keys = jax.random.split(key, t)
        x0, _ = jax.lax.scan(step, x_t, (t_indices, keys))
        return x0

    # -- full purify ----------------------------------------------------------
    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """diffuse-then-reverse, the reference's ``DiffWave.forward``."""
        k1, k2 = jax.random.split(key)
        x_t = self.diffuse(x, k1)
        return self.reverse(x_t, k2)

    # -- shortcuts -------------------------------------------------------------
    def one_shot_denoise(self, x_t: jnp.ndarray) -> jnp.ndarray:
        """Direct x0-prediction from eps at t* (ref ``:174-182,195-205``)."""
        t = self.reverse_timestep - 1
        eps = self._eps(x_t, t)
        abar = self.schedule.alpha_bar[t]
        return jnp.sqrt(1.0 / abar) * x_t - jnp.sqrt(1.0 / abar - 1.0) * eps

    def two_shot_denoise(self, x_t: jnp.ndarray) -> jnp.ndarray:
        """Predict x_1 from eps, then mu-step to x_0 (ref ``:184-193``)."""
        sched = self.schedule
        t = self.reverse_timestep - 1
        eps = self._eps(x_t, t)
        mu = jnp.sqrt(sched.alpha_bar[t] / sched.alpha[0])
        sig = jnp.sqrt(1.0 - sched.alpha_bar[t]
                       - (sched.alpha_bar[t] / sched.alpha[0])
                       * sched.beta[0] ** 2)
        x1 = (x_t - sig * eps) / mu
        _, mu0, _ = self.compute_coefficients(x1, 0)
        return mu0

    def fast_reverse(self, x_t: jnp.ndarray, key: jax.Array,
                     K: int = 3) -> jnp.ndarray:
        """K-step respaced reverse (ref ``:106-141``)."""
        import numpy as np

        sched = self.schedule
        abar = np.asarray(sched.alpha_bar)
        S = np.round(np.linspace(1, self.reverse_timestep, K)).astype(int) - 1
        beta_new = np.zeros(K, dtype=np.float64)
        beta_tilde_new = np.zeros(K, dtype=np.float64)
        for i in range(K):
            if i > 0:
                beta_new[i] = 1 - abar[S[i]] / abar[S[i - 1]]
                beta_tilde_new[i] = (1 - abar[S[i - 1]]) / (1 - abar[S[i]]) \
                    * beta_new[i]
            else:
                beta_new[i] = 1 - abar[S[i]]
                beta_tilde_new[i] = 0.0
        alpha_new = 1 - beta_new
        abar_new = np.cumprod(alpha_new)

        x = x_t
        keys = jax.random.split(key, K)
        for t in range(K - 1, -1, -1):
            eps = self._eps(x, int(S[t]))
            mu = (x - (1 - alpha_new[t]) / np.sqrt(1 - abar_new[t]) * eps) \
                / np.sqrt(alpha_new[t])
            z = jax.random.normal(keys[t], x.shape, dtype=x.dtype)
            x = mu + beta_tilde_new[t] * z  # ref uses sigma=beta_tilde as-is
        return x

    # -- unconditional generation ------------------------------------------------
    def sample(self, key: jax.Array, shape) -> jnp.ndarray:
        """Full-T ancestral sampling from noise (ref ``util.py:126-158``)."""
        k0, key = jax.random.split(key)
        x_T = jax.random.normal(k0, shape, dtype=jnp.float32)
        return self.reverse(x_T, key, t=self.schedule.T)


class RepeatedPurifier:
    """ReffWave: ``num_re`` rounds of (diffuse -> one-shot denoise)
    (reference ``diffwave_ddpm.py:251-313``)."""

    def __init__(self, ddpm: DDPMPurifier, num_re: int = 5):
        self.ddpm = ddpm
        self.num_re = num_re

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        def body(carry, k):
            x_t = self.ddpm.diffuse(carry, k)
            return self.ddpm.one_shot_denoise(x_t), None

        keys = jax.random.split(key, self.num_re)
        out, _ = jax.lax.scan(body, x, keys)
        return out
