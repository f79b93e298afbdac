"""WAV file I/O with stdlib + numpy — no librosa/torchaudio dependency.

Replaces the reference's ``librosa.load(path, sr=16000)`` /
``torchaudio.save`` data-layer usage (``datasets/sc_dataset.py``,
``utils.py:33-47``). Handles PCM 8/16/24/32 and float32 WAVs; resamples on
the host with the same polyphase windowed-sinc as the device resampler.
"""

from __future__ import annotations

import struct
import wave
from typing import Optional, Tuple

import numpy as np


def read_wav(path: str, sr: Optional[int] = 16000, mono: bool = True
             ) -> Tuple[np.ndarray, int]:
    """Returns (float32 samples in [-1, 1], sample_rate).

    ``sr``: resample target (None keeps native rate) — librosa.load
    semantics.
    """
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path}")
        fmt = None
        data = None
        while True:
            chunk_hdr = f.read(8)
            if len(chunk_hdr) < 8:
                break
            cid, size = struct.unpack("<4sI", chunk_hdr)
            payload = f.read(size + (size & 1))
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload[:size]
        if fmt is None or data is None:
            raise ValueError(f"missing fmt/data chunk: {path}")

    audio_format, n_channels, frame_rate, _, _, sampwidth_bits = fmt
    sampwidth = sampwidth_bits // 8

    if audio_format == 3 and sampwidth == 4:           # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif sampwidth == 2:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2 ** 31
    elif sampwidth == 1:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif sampwidth == 3:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = ((raw[:, 0].astype(np.int32))
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 2 ** 23, x - 2 ** 24, x).astype(np.float32) \
            / 2 ** 23
    else:
        raise ValueError(f"unsupported sample width: {sampwidth}")

    if n_channels > 1:
        x = x.reshape(-1, n_channels)
        x = x.mean(axis=1) if mono else x.T

    if sr is not None and sr != frame_rate:
        x = _resample_host(x, frame_rate, sr)
        frame_rate = sr
    return np.ascontiguousarray(x, dtype=np.float32), frame_rate


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000
              ) -> None:
    """Write mono float [-1, 1] samples as 16-bit PCM
    (the reference's ``utils.audio_save`` output format)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def _resample_host(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    """Host-side windowed-sinc resample (numpy twin of ops/resample.py)."""
    import math

    gcd = math.gcd(orig, new)
    o, n = orig // gcd, new // gcd
    width_param = 6
    rolloff = 0.99
    base_freq = min(o, n) * rolloff
    width = int(np.ceil(width_param * o / base_freq))
    idx = np.arange(-width, width + o, dtype=np.float64)[None, :] / o
    t = np.arange(0, -n, -1, dtype=np.float64)[:, None] / n + idx
    t = np.clip(t * base_freq, -width_param, width_param)
    window = np.cos(t * np.pi / width_param / 2) ** 2
    tp = t * np.pi
    kernel = np.where(tp == 0, 1.0, np.sin(tp) / np.where(tp == 0, 1.0, tp))
    kernel = kernel * window * base_freq / o

    L = len(x)
    xp = np.pad(x, (width, width + o))
    n_frames = (len(xp) - kernel.shape[1]) // o + 1
    frames = np.lib.stride_tricks.as_strided(
        xp, (n_frames, kernel.shape[1]),
        (xp.strides[0] * o, xp.strides[0]))
    y = (frames @ kernel.T).reshape(-1)
    target = int(np.ceil(new * L / orig))
    return y[:target].astype(np.float32)
