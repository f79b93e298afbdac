"""IIR filtering (lfilter) as a batched lax.scan recurrence.

TPU-native replacement for the reference's ``torch_lfilter`` C++ extension,
which is CPU-only and applied in a per-sample Python loop
(``transforms/frequency_defense.py:88-97``): here the recurrence runs on
device over the whole batch at once (the batch dim rides the VPU lanes),
and filter design (scipy butter/buttord) happens at trace time with static
coefficients (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as ss


def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Direct-form-II-transposed IIR filter, matching ``scipy.signal.lfilter``
    (zero initial state). x: (..., L), filtered along the last axis.

    b, a are *static* numpy coefficients (designed at trace time).
    """
    b = np.asarray(b, dtype=np.float32)
    a = np.asarray(a, dtype=np.float32)
    b = b / a[0]
    a = a / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))

    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    xf = x.reshape(-1, L)

    b_j = jnp.asarray(b)
    a_j = jnp.asarray(a)

    def step(z, x_t):
        # z: (B, n-1) filter state; direct form II transposed
        y_t = b_j[0] * x_t + z[:, 0]
        z_new = jnp.concatenate([z[:, 1:], jnp.zeros_like(z[:, :1])], axis=1)
        z_new = z_new + b_j[1:][None, :] * x_t[:, None] \
            - a_j[1:][None, :] * y_t[:, None]
        return z_new, y_t

    z0 = jnp.zeros((xf.shape[0], n - 1), dtype=x.dtype)
    _, ys = jax.lax.scan(step, z0, xf.T)
    return ys.T.reshape(*batch_shape, L)


def butter_lowpass(wp: float = 4000, ws: float = 8000, fs: int = 16000,
                   gpass: float = 3, gstop: float = 40
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Butterworth low-pass design, the reference's LPF parameters
    (``frequency_defense.py:62-86``)."""
    wp_n, ws_n = 2 * wp / fs, 2 * ws / fs
    N, Wn = ss.buttord(wp_n, ws_n, gpass, gstop, analog=False)
    return ss.butter(N, Wn, btype="low", analog=False, output="ba")


def butter_bandpass(wp: Sequence[float] = (300, 4000),
                    ws: Sequence[float] = (50, 8000), fs: int = 16000,
                    gpass: float = 3, gstop: float = 40
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Butterworth band-pass design, the reference's BPF parameters
    (``frequency_defense.py:101-126``)."""
    wp_n = [2 * w / fs for w in wp]
    ws_n = [2 * w / fs for w in ws]
    N, Wn = ss.buttord(wp_n, ws_n, gpass, gstop, analog=False)
    return ss.butter(N, Wn, btype="bandpass", analog=False, output="ba")
