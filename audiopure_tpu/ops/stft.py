"""STFT / mel-spectrogram front-end as pure XLA ops.

TPU-native replacement for the reference's runtime mel front-end
(``adaptive_attack_eval.py:83-85``: ``torchaudio.transforms.MelSpectrogram(
n_fft=2048, hop_length=512, n_mels=32, norm='slaney', mel_scale='slaney',
pad_mode='constant')`` + ``AmplitudeToDB(stype='power')``).

Design notes (TPU-first):

* The whole front-end is differentiable and jit-able — the reference pays a
  host round-trip through torchaudio per attack query; here it fuses into the
  purify->classify program.
* On TPU the 2048-point DFT is computed as two real matmuls against
  precomputed cos/sin matrices (``method='matmul'``) so it runs on the MXU;
  an ``rfft`` path exists for CPU tests. Both give identical results to 1e-4.
* Framing is a strided gather; with hop 512 / length 16000 / center padding it
  yields exactly the reference's 32 frames, so a 1-second utterance maps to
  the (32 mel, 32 frame) "image" every spectrogram classifier consumes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window — matches ``torch.hann_window``."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


# ---------------------------------------------------------------------------
# Mel filterbank (host-side numpy; becomes an XLA constant under jit)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray, mel_scale: str) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray, mel_scale: str) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = f_sp * mels
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: Optional[str] = "slaney",
    mel_scale: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels).

    Semantics of ``torchaudio.functional.melscale_fbanks`` (used by the
    reference's MelSpectrogram): linear DFT bin frequencies, triangle
    endpoints on the chosen mel scale, optional Slaney area normalization.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]           # rising edge
    up_slopes = slopes[:, 2:] / f_diff[1:]                # falling edge
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT power spectrogram
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int):
    """Windowed real-DFT cos/sin matrices, shape (n_fft, n_fft//2+1)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None]
    cos_m = (np.cos(ang) * w).astype(np.float32)
    sin_m = (-np.sin(ang) * w).astype(np.float32)
    return cos_m, sin_m


def _frame(x: jnp.ndarray, n_fft: int, hop_length: int,
           center: bool) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, n_fft) by strided gather."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="constant")
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    return x[..., idx]


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    power: float = 2.0,
    method: str = "matmul",
) -> jnp.ndarray:
    """Hann-windowed STFT magnitude^power. (..., L) -> (..., n_freq, n_frames).

    ``method='matmul'`` runs the DFT on the MXU (preferred on TPU);
    ``method='fft'`` uses ``jnp.fft.rfft``.
    """
    frames = _frame(x, n_fft, hop_length, center)  # (..., n_frames, n_fft)
    if method == "matmul":
        cos_m, sin_m = _dft_matrices(n_fft)
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        mag_sq = re * re + im * im
    else:
        w = jnp.asarray(hann_window(n_fft), dtype=frames.dtype)
        spec = jnp.fft.rfft(frames * w, axis=-1)
        mag_sq = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 2.0:
        out = mag_sq
    elif power == 1.0:
        out = jnp.sqrt(mag_sq)
    else:
        out = mag_sq ** (power / 2.0)
    return jnp.swapaxes(out, -1, -2)  # (..., n_freq, n_frames)


def amplitude_to_db(
    x: jnp.ndarray,
    stype: str = "power",
    amin: float = 1e-10,
    ref_value: float = 1.0,
    top_db: Optional[float] = None,
) -> jnp.ndarray:
    """``torchaudio.transforms.AmplitudeToDB`` semantics."""
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.clip(x, min=amin))
    db = db - multiplier * np.log10(max(amin, ref_value))
    if top_db is not None:
        max_db = jnp.max(db, axis=tuple(range(1, db.ndim)), keepdims=True)
        db = jnp.maximum(db, max_db - top_db)
    return db


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 32,
    norm: Optional[str] = "slaney",
    mel_scale: str = "slaney",
    power: float = 2.0,
    method: str = "matmul",
) -> jnp.ndarray:
    """(..., L) waveform -> (..., n_mels, n_frames) mel power spectrogram."""
    spec = stft_power(x, n_fft, hop_length, center=True, power=power,
                      method=method)
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, norm=norm,
                       mel_scale=mel_scale)
    )
    # (..., n_freq, n_frames) -> (..., n_mels, n_frames)
    return jnp.einsum("...fn,fm->...mn", spec, fb)


class MelFrontEnd:
    """Callable wave->log-mel transform: the ``Wave2Spect`` of the reference.

    Maps (B, 1, 16000) -> (B, 1, n_mels, n_frames) so mel "images" feed 2D
    classifiers exactly like the reference does.
    """

    def __init__(self, sample_rate=16000, n_fft=2048, hop_length=512,
                 n_mels=32, norm="slaney", mel_scale="slaney",
                 power=2.0, method="matmul", top_db=None):
        self.kw = dict(sample_rate=sample_rate, n_fft=n_fft,
                       hop_length=hop_length, n_mels=n_mels, norm=norm,
                       mel_scale=mel_scale, power=power, method=method)
        self.top_db = top_db

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mel = mel_spectrogram(x, **self.kw)
        return amplitude_to_db(mel, stype="power", top_db=self.top_db)
