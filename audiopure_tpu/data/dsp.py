"""Host-side numpy DSP for the augmentation pipeline.

librosa-compatible STFT/ISTFT (center reflect pad, hann), phase vocoder,
mel filterbank and power_to_db — replacing the reference's librosa calls in
``transforms/transforms_wav.py`` and ``transforms_stft.py``. These run in
the CPU data pipeline; the *device* front-end lives in ``ops/stft.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from audiopure_tpu.ops.stft import hann_window, mel_filterbank


def stft(y: np.ndarray, n_fft: int = 2048, hop_length: int = 512,
         center: bool = True) -> np.ndarray:
    """(L,) -> complex (n_fft//2+1, frames); librosa.stft semantics."""
    if center:
        y = np.pad(y, n_fft // 2, mode="reflect")
    w = hann_window(n_fft)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    frames = y[idx] * w[None, :]
    return np.fft.rfft(frames, axis=-1).T.astype(np.complex64)


def istft(S: np.ndarray, hop_length: int = 512, center: bool = True,
          length: Optional[int] = None, dtype=np.float32) -> np.ndarray:
    """Inverse STFT with hann synthesis window + COLA normalization;
    librosa.istft semantics."""
    n_fft = 2 * (S.shape[0] - 1)
    w = hann_window(n_fft)
    frames = np.fft.irfft(S.T, n=n_fft, axis=-1)  # (T, n_fft)
    T = frames.shape[0]
    out_len = n_fft + hop_length * (T - 1)
    y = np.zeros(out_len, dtype=np.float64)
    norm = np.zeros(out_len, dtype=np.float64)
    for i in range(T):
        s = i * hop_length
        y[s: s + n_fft] += frames[i] * w
        norm[s: s + n_fft] += w ** 2
    y = y / np.maximum(norm, 1e-10)
    if center:
        y = y[n_fft // 2:]
        if length is None:
            y = y[: max(0, out_len - n_fft)]
    if length is not None:
        y = np.pad(y[:length], (0, max(0, length - len(y))))
    return y.astype(dtype)


def phase_vocoder(S: np.ndarray, rate: float, hop_length: int = 512
                  ) -> np.ndarray:
    """Time-stretch an STFT by ``rate`` (librosa.phase_vocoder semantics):
    linear magnitude interpolation + phase accumulation."""
    n_freq = S.shape[0]
    n_fft = 2 * (n_freq - 1)
    time_steps = np.arange(0, S.shape[1], rate)
    phi_advance = np.linspace(0, np.pi * hop_length, n_freq)

    S_pad = np.pad(S, ((0, 0), (0, 2)))
    stretched = np.zeros((n_freq, len(time_steps)), dtype=np.complex64)
    phase_acc = np.angle(S[:, 0])
    for t, step in enumerate(time_steps):
        i = int(step)
        frac = step - i
        mag = (1 - frac) * np.abs(S_pad[:, i]) + frac * np.abs(
            S_pad[:, i + 1])
        stretched[:, t] = mag * np.exp(1j * phase_acc)
        dphase = (np.angle(S_pad[:, i + 1]) - np.angle(S_pad[:, i])
                  - phi_advance)
        dphase = dphase - 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase
    return stretched


def time_stretch(y: np.ndarray, rate: float, n_fft: int = 2048,
                 hop_length: int = 512) -> np.ndarray:
    """librosa.effects.time_stretch: STFT -> phase vocoder -> ISTFT."""
    S = stft(y, n_fft, hop_length)
    S2 = phase_vocoder(S, rate, hop_length)
    return istft(S2, hop_length, length=int(round(len(y) / rate)))


def power_to_db(S: np.ndarray, ref=np.max, amin: float = 1e-10,
                top_db: Optional[float] = 80.0) -> np.ndarray:
    """librosa.power_to_db."""
    ref_value = ref(S) if callable(ref) else ref
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def melspectrogram(y: np.ndarray, sr: int = 16000, n_fft: int = 2048,
                   hop_length: int = 512, n_mels: int = 32) -> np.ndarray:
    """librosa.feature.melspectrogram (power 2, slaney norm + scale)."""
    S = np.abs(stft(y, n_fft, hop_length)) ** 2
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr, norm="slaney",
                        mel_scale="slaney")
    return fb.T @ S
