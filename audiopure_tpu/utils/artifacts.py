"""Artifact dumps: wav files, spectrogram PNGs, waveform PNGs.

Rebuild of the reference's ``utils.py:10-73`` (librosa.specshow /
torchaudio.save) on numpy + matplotlib + our WAV writer.
"""

from __future__ import annotations

import os

import numpy as np

from audiopure_tpu.data.wavio import write_wav


def _ensure(path: str) -> None:
    if path and not os.path.isdir(path):
        os.makedirs(path, exist_ok=True)


def audio_save(waveform, path: str = ".", name: str = "audio.wav",
               sample_rate: int = 16000) -> None:
    """(1, L) or (L,) float waveform -> 16 kHz 16-bit wav
    (ref ``utils.py:33-47``)."""
    _ensure(path)
    write_wav(os.path.join(path, name),
              np.asarray(waveform).reshape(-1), sample_rate)


def spec_save(spectrogram, path: str = ".", name: str = "spec.png") -> None:
    """(1, n_mels, T) or (n_mels, T) dB spectrogram -> PNG
    (ref ``utils.py:10-31``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure(path)
    s = np.asarray(spectrogram)
    if s.ndim == 3:
        s = s[0]
    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(s, origin="lower", aspect="auto", cmap="magma")
    fig.colorbar(im, ax=ax, format="%+2.0f dB")
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    fig.savefig(os.path.join(path, name), dpi=100, bbox_inches="tight")
    plt.close(fig)


def audio_save_as_img(waveform, path: str = ".", name: str = "wave.png",
                      sample_rate: int = 16000) -> None:
    """Waveform plot PNG (ref ``utils.py:49-73``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure(path)
    w = np.asarray(waveform).reshape(-1)
    fig, ax = plt.subplots(figsize=(6, 2))
    ax.plot(np.arange(len(w)) / sample_rate, w, linewidth=0.5)
    ax.set_xlabel("seconds")
    ax.set_ylim(-1, 1)
    fig.savefig(os.path.join(path, name), dpi=100, bbox_inches="tight")
    plt.close(fig)
