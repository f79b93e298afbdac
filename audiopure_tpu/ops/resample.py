"""Windowed-sinc resampling as a strided convolution.

TPU-native equivalent of ``torchaudio.transforms.Resample`` (used by the
reference's DS down/up-sampling defense, ``frequency_defense.py:37-60``):
polyphase windowed-sinc (Hann) interpolation expressed as
``lax.conv_general_dilated`` so it runs on the MXU — no host round-trip.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int,
                 lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Polyphase kernel (new_freq, 1, width) + padding, torchaudio-style."""
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd

    base_freq = min(orig, new) * rolloff
    width = int(np.ceil(lowpass_filter_width * orig / base_freq))
    # time axis in units of orig-rate samples
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * base_freq / orig
    return (jnp.asarray(kernel[:, None, :], dtype=jnp.float32),
            width, orig, new)


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6,
             rolloff: float = 0.99) -> jnp.ndarray:
    """(..., L) -> (..., ceil(L * new/orig)). Hann-windowed sinc."""
    kernel, width, orig, new = _sinc_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    shape = x.shape
    L = shape[-1]
    xf = x.reshape(-1, 1, L)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        xf, kernel, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    # y: (B, new, frames) -> interleave polyphase outputs
    y = jnp.swapaxes(y, 1, 2).reshape(xf.shape[0], -1)
    target_len = int(np.ceil(new_freq * L / orig_freq))
    return y[:, :target_len].reshape(*shape[:-1], target_len)
