"""DDPM spectrogram purifier ("ImprovedDiffusion" defense).

TPU-native rebuild of ``diffusion_models/improved_diffusion_ddpm.py:11-98``:
standardize a log-mel spectrogram to [-1, 1], q-sample to step t, run the
ancestral reverse loop back to 0, inverse-standardize.

Note: the reference's ``_reverse`` is broken — it builds the sample
generator but never returns the result (``improved_diffusion_ddpm.py:53-59``
returns ``None``). This implementation is the working version of that
intent; the broken behaviour is obviously not reproduced.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.diffusion.gaussian import GaussianDiffusion

MEL_UPPER = 38.22   # ref sc09_spectrogram_dataset.py:62-63
MEL_LOWER = -100.0


def melspec_standardize(x):
    """Scale log-mel dB values to [-1, 1] (ref ``:70-77``)."""
    return 2.0 * (x - MEL_LOWER) / (MEL_UPPER - MEL_LOWER) - 1.0


def melspec_inv_standardize(x):
    return (x + 1.0) * (MEL_UPPER - MEL_LOWER) / 2.0 + MEL_LOWER


class SpecDDPMPurifier:
    """``model(x, t) -> eps`` on (B, 1, H, W); purify via
    diffuse-to-t + t-step ancestral reverse."""

    def __init__(self, model: Callable, diffusion: GaussianDiffusion,
                 reverse_timestep: int = 100, clip_denoised: bool = True,
                 standardize: bool = True):
        self.model = model
        self.diffusion = diffusion
        self.reverse_timestep = int(reverse_timestep)
        self.clip_denoised = clip_denoised
        self.standardize = standardize

    def __call__(self, spec: jnp.ndarray, key: jax.Array,
                 t: Optional[int] = None) -> jnp.ndarray:
        t = self.reverse_timestep if t is None else t
        d = self.diffusion
        x0 = melspec_standardize(spec) if self.standardize else spec

        k_noise, k_loop = jax.random.split(key)
        B = x0.shape[0]
        noise = jax.random.normal(k_noise, x0.shape, dtype=x0.dtype)
        t_vec = jnp.full((B,), t - 1, dtype=jnp.int32)
        x_t = d.q_sample(x0, t_vec, noise)

        def step(carry, inp):
            xi = carry
            t_scalar, k = inp
            tv = jnp.full((B,), t_scalar, dtype=jnp.int32)
            xi, _ = d.p_sample(self.model, xi, tv, k,
                               clip_denoised=self.clip_denoised)
            return xi, None

        ts = jnp.arange(t - 1, -1, -1)
        keys = jax.random.split(k_loop, t)
        x_rev, _ = jax.lax.scan(step, x_t, (ts, keys))
        return melspec_inv_standardize(x_rev) if self.standardize else x_rev
