"""Psychoacoustic masker (Lin & Abdulla 2015 / Qin et al. 2019).

Rebuild of ``robustness_eval/white_box_attack.py:36-273``. This is host-side
numpy *by design*: the masking threshold is computed once per clean input
(data-dependent peak finding doesn't belong on the TPU), then shipped to the
device as constants for the stage-2 loss (see ``attacks/imperceptible.py``).

Pipeline: STFT analysis + 96 dB SPL normalization -> tonal masker
identification (local PSD maxima, +-1-bin smoothing) -> filtering (absolute
threshold of hearing, then 0.5-bark proximity keeping the larger) ->
two-slope spread functions -> global threshold.

Deviations from the reference, on purpose (``ref_quirks=False`` default):

* the bark-proximity filter indexes the bark scale by *masker frequency
  bin* (``bark[masker_idx[i]]``); the reference indexes by list position
  (``bark[i]``, ``white_box_attack.py:224``) — adjacent FFT bins are
  always < 0.5 bark apart, so the reference treats every consecutive
  masker pair as "close" and merges pairwise along the list instead of
  by true bark distance (measured: it keeps ~2x the maskers; thresholds
  differ by ~0.6 dB mean, up to ~49 dB locally, both directions);
* on deleting the smaller ``i_prev``, the reference sets
  ``i_prev = i_prev + 1`` (``:226``), which can point at a masker deleted
  in an earlier step; we advance to the surviving ``i``.

``ref_quirks=True`` reproduces both behaviors bit-exactly — golden-tested
against the executed reference masker in
``tests/test_ref_parity_masker.py``, which also quantifies the threshold
delta between the two modes (docs/PARITY.md).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import signal as ss

from audiopure_tpu.ops.stft import hann_window


class PsychoacousticMasker:
    def __init__(self, window_size: int = 2048, hop_size: int = 512,
                 sample_rate: int = 16000, ref_quirks: bool = False):
        self.window_size = window_size
        self.hop_size = hop_size
        self.sample_rate = sample_rate
        self.ref_quirks = ref_quirks
        self._fft_frequencies: Optional[np.ndarray] = None
        self._bark: Optional[np.ndarray] = None
        self._ath: Optional[np.ndarray] = None

    # -- frequency scales ---------------------------------------------------
    @property
    def fft_frequencies(self) -> np.ndarray:
        if self._fft_frequencies is None:
            self._fft_frequencies = np.linspace(
                0, self.sample_rate / 2, self.window_size // 2 + 1)
        return self._fft_frequencies

    @property
    def bark(self) -> np.ndarray:
        if self._bark is None:
            f = self.fft_frequencies
            self._bark = 13 * np.arctan(0.00076 * f) \
                + 3.5 * np.arctan(np.square(f / 7500.0))
        return self._bark

    @property
    def absolute_threshold_hearing(self) -> np.ndarray:
        if self._ath is None:
            f = self.fft_frequencies
            valid = np.logical_and(20 <= f, f <= 2e4)
            khz = f[valid] * 1e-3
            ath = np.full(f.shape, -np.inf)
            ath[valid] = (3.64 * khz ** -0.8
                          - 6.5 * np.exp(-0.6 * np.square(khz - 3.3))
                          + 1e-3 * khz ** 4 - 12)
            self._ath = ath
        return self._ath

    # -- PSD ------------------------------------------------------------------
    def power_spectral_density(self, audio: np.ndarray
                               ) -> Tuple[np.ndarray, float]:
        """(length,) -> (PSD matrix (n_freq, frames) at 96 dB norm,
        PSD maximum)."""
        w = hann_window(self.window_size)
        n_frames = 1 + (len(audio) - self.window_size) // self.hop_size
        idx = (np.arange(n_frames)[:, None] * self.hop_size
               + np.arange(self.window_size)[None, :])
        frames = audio.astype(np.float32)[idx] * w[None, :]
        stft = np.fft.rfft(frames, axis=-1).T  # (n_freq, frames)

        gain = np.sqrt(8.0 / 3.0)
        with np.errstate(divide="ignore"):
            psd = 20 * np.log10(np.abs(gain * stft / self.window_size))
        psd = psd.clip(min=-200)
        psd_max = float(np.max(psd))
        return 96.0 - psd_max + psd, psd_max

    # -- maskers ----------------------------------------------------------------
    def find_maskers(self, psd_vector: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Local maxima as tonal maskers, smoothed with +-1 neighbours."""
        masker_idx = ss.argrelmax(psd_vector)[0]
        psd_maskers = 10 * np.log10(np.sum(
            [10 ** (psd_vector[masker_idx + i] / 10) for i in (-1, 0, 1)],
            axis=0))
        return psd_maskers, masker_idx

    def filter_maskers(self, maskers: np.ndarray, masker_idx: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        ath = maskers > self.absolute_threshold_hearing[masker_idx]
        masker_idx = masker_idx[ath]
        maskers = maskers[ath]

        keep = np.ones(masker_idx.shape, dtype=bool)
        i_prev = 0
        for i in range(1, len(masker_idx)):
            if self.ref_quirks:   # list-position bark indexing (ref :224)
                close = self.bark[i] - self.bark[i_prev] < 0.5
            else:                 # frequency-bin indexing (fixed)
                close = (self.bark[masker_idx[i]]
                         - self.bark[masker_idx[i_prev]]) < 0.5
            if close:
                if maskers[i_prev] < maskers[i]:
                    keep[i_prev] = False
                    # ref :226 advances to i_prev+1 (may be deleted);
                    # fixed mode advances to the surviving i
                    i_prev = i_prev + 1 if self.ref_quirks else i
                else:
                    keep[i] = False
            else:
                i_prev = i
        return maskers[keep], masker_idx[keep]

    # -- thresholds -----------------------------------------------------------------
    def calculate_individual_threshold(self, maskers: np.ndarray,
                                       masker_idx: np.ndarray) -> np.ndarray:
        delta_shift = -6.025 - 0.275 * self.bark
        thresholds = np.zeros((len(masker_idx),) + self.bark.shape)
        for k, (j, masker) in enumerate(zip(masker_idx, maskers)):
            delta_z = self.bark - self.bark[j]
            spread = 27 * delta_z
            pos = delta_z > 0
            spread[pos] = (-27 + 0.37 * max(masker - 40, 0)) * delta_z[pos]
            thresholds[k] = masker + delta_shift[j] + spread
        return thresholds

    def calculate_global_threshold(self, individual: np.ndarray
                                   ) -> np.ndarray:
        with np.errstate(divide="ignore"):
            return 10 * np.log10(
                np.sum(10 ** (individual / 10), axis=0)
                + 10 ** (self.absolute_threshold_hearing / 10))

    def calculate_threshold_and_psd_maximum(self, audio: np.ndarray
                                            ) -> Tuple[np.ndarray, float]:
        """(length,) -> (threshold (n_freq, frames), psd max)."""
        psd, psd_max = self.power_spectral_density(audio)
        threshold = np.zeros_like(psd)
        for frame in range(psd.shape[1]):
            maskers, idx = self.filter_maskers(
                *self.find_maskers(psd[:, frame]))
            threshold[:, frame] = self.calculate_global_threshold(
                self.calculate_individual_threshold(maskers, idx))
        return threshold, psd_max
