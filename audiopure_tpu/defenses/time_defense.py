"""Time-domain baseline defenses: AT / AS / MS (+ QT/BDR quantization).

TPU-native rebuild of ``transforms/time_defense.py:8-157``:

* AT — "audio turbulence": gaussian noise at a target SNR (default 25 dB).
* AS — "average smoothing": k=3 mean filter (a conv).
* MS — "median smoothing": k=3 sliding median (sort of a 3-tap sort).
* QT/BDR — quantization / bit-depth reduction, which the reference ships
  commented-out with BPDA wiring (``:40-78``); provided here with
  straight-through gradients via :func:`audiopure_tpu.attacks.bpda.bpda`.

All are batched XLA ops over (..., L); AT takes a PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.bpda import bpda


def AT(audio: jnp.ndarray, key: jax.Array, param: float = 25.0
       ) -> jnp.ndarray:
    """Add white noise at ``param`` dB SNR (ref ``:80-100``)."""
    shape = audio.shape
    x = audio.reshape(shape[0], -1) if audio.ndim > 1 else audio[None]
    snr = 10.0 ** (param / 10.0)
    N = x.shape[-1]
    power_audio = jnp.sum((x / jnp.sqrt(N)) ** 2, axis=-1, keepdims=True)
    power_noise = power_audio / snr
    noise = jax.random.normal(key, x.shape, dtype=x.dtype) \
        * jnp.sqrt(power_noise)
    return (x + noise).reshape(shape)


def AS(audio: jnp.ndarray, param: int = 3) -> jnp.ndarray:
    """Mean filter with odd kernel (ref ``:102-127``)."""
    assert param % 2 == 1
    shape = audio.shape
    x = audio.reshape(-1, shape[-1])
    pad = (param - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    # windowed mean via cumulative sum: O(L)
    csum = jnp.cumsum(jnp.pad(xp, ((0, 0), (1, 0))), axis=-1)
    out = (csum[:, param:] - csum[:, :-param]) / param
    return out.reshape(shape)


def MS(audio: jnp.ndarray, param: int = 3) -> jnp.ndarray:
    """Sliding median with zero padding (ref ``:130-157``)."""
    shape = audio.shape
    x = audio.reshape(-1, shape[-1])
    pad = (param - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    windows = jnp.stack([xp[:, i: i + x.shape[-1]] for i in range(param)],
                        axis=-1)
    out = jnp.median(windows, axis=-1)
    return out.reshape(shape)


def _qt_raw(audio: jnp.ndarray, param: int = 128, bits: int = 16
            ) -> jnp.ndarray:
    """Quantization (non-differentiable round), ref ``QT_Non_Diff`` (:40-72)."""
    abs_max = 2.0 ** (bits - 1)
    in_unit = jnp.logical_and(0.9 * audio.max() <= 1.0,
                              0.9 * audio.min() >= -1.0)
    scale = jnp.where(in_unit, abs_max, 1.0)
    q = float(param)
    out = jnp.round(audio * scale / q) * q / scale
    return out


QT = bpda(_qt_raw)  # straight-through gradient, like the reference's BPDA


def BDR(audio: jnp.ndarray, param: int = 8, bits: int = 16) -> jnp.ndarray:
    """Bit-depth reduction = QT with q = 2^(bits - param) (ref ``:76-78``)."""
    return QT(audio, 2 ** (bits - param), bits)


class TimeDomainDefense:
    """Dispatcher mirroring the reference class (``time_defense.py:8-36``).
    AT is stochastic — pass a key; others ignore it."""

    NAMES = {"AT": "Audio_Turbulence", "AS": "Average_Smoothing",
             "MS": "Median_Smoothing", "QT": "Quantization",
             "BDR": "Bit_Depth_Reduction"}

    def __init__(self, defense_type: str):
        if defense_type not in self.NAMES:
            raise NotImplementedError(
                f"Unknown defense type: {defense_type}!")
        self.defense_type = defense_type

    def __call__(self, x: jnp.ndarray, key: jax.Array = None) -> jnp.ndarray:
        if self.defense_type == "AT":
            if key is None:
                raise ValueError("AT defense requires a PRNG key")
            return AT(x, key)
        if self.defense_type == "AS":
            return AS(x)
        if self.defense_type == "MS":
            return MS(x)
        if self.defense_type == "QT":
            return QT(x)
        return BDR(x)

    def _get_name(self):
        return self.NAMES[self.defense_type]
