"""Frequency-domain baseline defenses: DS / LPF / BPF.

TPU-native rebuild of ``transforms/frequency_defense.py:7-141``:

* DS  — down-sample 0.5x then up-sample back (windowed-sinc, on device).
* LPF — Butterworth low-pass (wp=4k, ws=8k) via scan-IIR.
* BPF — Butterworth band-pass (300-4k) via scan-IIR.

The reference designs the butterworth filters with scipy then loops
per-sample through the CPU-only ``torch_lfilter`` extension (``:88-97``);
here design is trace-time-static and the recurrence runs batched on device
(``ops/iir.lfilter``).
"""

from __future__ import annotations

import jax.numpy as jnp

from audiopure_tpu.ops.iir import butter_bandpass, butter_lowpass, lfilter
from audiopure_tpu.ops.resample import resample


def DS(audio: jnp.ndarray, param: float = 0.5, fs: int = 16000
       ) -> jnp.ndarray:
    """Down/up-resample (ref ``:37-60``)."""
    new_freq = int(fs * param)
    down = resample(audio, fs, new_freq)
    up = resample(down, new_freq, fs)
    return up[..., : audio.shape[-1]]


def LPF(audio: jnp.ndarray, fs: int = 16000, wp: float = 4000,
        param: float = 8000, gpass: float = 3, gstop: float = 40,
        clip: bool = True) -> jnp.ndarray:
    """Butterworth low-pass (ref ``:62-99``)."""
    b, a = butter_lowpass(wp, param, fs, gpass, gstop)
    out = lfilter(b, a, audio)
    return jnp.clip(out, -1.0, 1.0) if clip else out


def BPF(audio: jnp.ndarray, fs: int = 16000, wp=(300, 4000),
        param=(50, 8000), gpass: float = 3, gstop: float = 40,
        clip: bool = True) -> jnp.ndarray:
    """Butterworth band-pass (ref ``:101-141``)."""
    b, a = butter_bandpass(wp, param, fs, gpass, gstop)
    out = lfilter(b, a, audio)
    return jnp.clip(out, -1.0, 1.0) if clip else out


class FreqDomainDefense:
    """Dispatcher mirroring the reference class (``frequency_defense.py:7-35``)."""

    NAMES = {"DS": "Down_Sampling", "LPF": "Low_Pass_Filter",
             "BPF": "Band_Pass_Filter"}

    def __init__(self, defense_type: str):
        if defense_type not in self.NAMES:
            raise NotImplementedError(
                f"Unknown defense type: {defense_type}!")
        self.defense_type = defense_type

    def __call__(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        del key  # deterministic defenses
        if self.defense_type == "DS":
            return DS(x)
        if self.defense_type == "LPF":
            return LPF(x)
        return BPF(x)

    def _get_name(self):
        return self.NAMES[self.defense_type]
