"""Dataset-dict augmentation transforms (wave + STFT domain).

Rebuild of ``transforms/transforms_wav.py:12-159`` and
``transforms/transforms_stft.py:14-129``. Same dict protocol
(``{'path','target','samples','sample_rate', ...}``) so pipelines compose
with ``Compose([...])``; randomness goes through an explicit
``np.random.Generator`` (pass ``rng=`` or seed the module default) instead
of the global ``random`` module.

These run host-side in the data pipeline. The *eval-time* mel front-end is
the device-side ``ops.stft.MelFrontEnd``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from audiopure_tpu.data import dsp
from audiopure_tpu.data.wavio import read_wav

_default_rng = np.random.default_rng(0)


def seed(s: int) -> None:
    global _default_rng
    _default_rng = np.random.default_rng(s)


def _rng(data) -> np.random.Generator:
    return data.get("rng", _default_rng)


def should_apply_transform(data, prob: float = 0.5) -> bool:
    return _rng(data).random() < prob


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


# ---------------------------------------------------------------------------
# wave domain (ref transforms_wav.py)
# ---------------------------------------------------------------------------

class LoadAudio:
    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, data):
        path = data["path"]
        if path:
            samples, sr = read_wav(path, sr=self.sample_rate)
        else:  # silence
            sr = self.sample_rate
            samples = np.zeros(sr, dtype=np.float32)
        data["samples"] = samples
        data["sample_rate"] = sr
        return data


class FixAudioLength:
    def __init__(self, time: float = 1.0):
        self.time = time

    def __call__(self, data):
        samples = data["samples"]
        length = int(self.time * data["sample_rate"])
        if length < len(samples):
            data["samples"] = samples[:length]
        elif length > len(samples):
            data["samples"] = np.pad(samples, (0, length - len(samples)),
                                     "constant")
        return data


class ChangeAmplitude:
    def __init__(self, amplitude_range=(0.7, 1.1)):
        self.amplitude_range = amplitude_range

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        data["samples"] = data["samples"] * _rng(data).uniform(
            *self.amplitude_range)
        return data


class ChangeSpeedAndPitchAudio:
    """Resample-by-interp speed change (also shifts pitch)."""

    def __init__(self, max_scale: float = 0.2):
        self.max_scale = max_scale

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        samples = data["samples"]
        scale = _rng(data).uniform(-self.max_scale, self.max_scale)
        speed_fac = 1.0 / (1 + scale)
        data["samples"] = np.interp(
            np.arange(0, len(samples), speed_fac),
            np.arange(0, len(samples)), samples).astype(np.float32)
        return data


class StretchAudio:
    """Phase-vocoder time stretch (pitch preserved)."""

    def __init__(self, max_scale: float = 0.2):
        self.max_scale = max_scale

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        scale = _rng(data).uniform(-self.max_scale, self.max_scale)
        data["samples"] = dsp.time_stretch(data["samples"], 1 + scale)
        return data


class TimeshiftAudio:
    def __init__(self, max_shift_seconds: float = 0.2):
        self.max_shift_seconds = max_shift_seconds

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        samples = data["samples"]
        max_shift = int(data["sample_rate"] * self.max_shift_seconds)
        shift = int(_rng(data).integers(-max_shift, max_shift + 1))
        a, b = -min(0, shift), max(0, shift)
        samples = np.pad(samples, (a, b), "constant")
        data["samples"] = samples[: len(samples) - a] if a else samples[b:]
        return data


class AddBackgroundNoise:
    def __init__(self, bg_dataset, max_percentage: float = 0.45):
        self.bg_dataset = bg_dataset
        self.max_percentage = max_percentage

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        rng = _rng(data)
        noise = self.bg_dataset[int(rng.integers(len(self.bg_dataset)))][
            "samples"]
        pct = rng.uniform(0, self.max_percentage)
        data["samples"] = data["samples"] * (1 - pct) + noise * pct
        return data


class ToMelSpectrogram:
    def __init__(self, n_mels: int = 32):
        self.n_mels = n_mels

    def __call__(self, data):
        s = dsp.melspectrogram(data["samples"], data["sample_rate"],
                               n_mels=self.n_mels)
        data["mel_spectrogram"] = dsp.power_to_db(s, ref=np.max)
        return data


class ToArray:
    """The reference's ToTensor, minus torch: optional mean/std normalize."""

    def __init__(self, np_name: str, out_name: str, normalize=None):
        self.np_name = np_name
        self.out_name = out_name
        self.normalize = normalize

    def __call__(self, data):
        arr = np.asarray(data[self.np_name], dtype=np.float32)
        if self.normalize is not None:
            mean, std = self.normalize
            arr = (arr - mean) / std
        data[self.out_name] = arr
        return data


ToTensor = ToArray  # interface-compat alias


# ---------------------------------------------------------------------------
# STFT domain (ref transforms_stft.py)
# ---------------------------------------------------------------------------

class ToSTFT:
    def __init__(self, n_fft: int = 2048, hop_length: int = 512):
        self.n_fft = n_fft
        self.hop_length = hop_length

    def __call__(self, data):
        data["n_fft"] = self.n_fft
        data["hop_length"] = self.hop_length
        data["stft"] = dsp.stft(data["samples"], self.n_fft, self.hop_length)
        data["stft_shape"] = data["stft"].shape
        return data


class StretchAudioOnSTFT:
    def __init__(self, max_scale: float = 0.2):
        self.max_scale = max_scale

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        scale = _rng(data).uniform(-self.max_scale, self.max_scale)
        data["stft"] = dsp.phase_vocoder(data["stft"], 1 + scale,
                                         data["hop_length"])
        return data


class TimeshiftAudioOnSTFT:
    def __init__(self, max_shift: int = 8):
        self.max_shift = max_shift

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        stft = data["stft"]
        shift = int(_rng(data).integers(-self.max_shift,
                                        self.max_shift + 1))
        a, b = -min(0, shift), max(0, shift)
        stft = np.pad(stft, ((0, 0), (a, b)), "constant")
        data["stft"] = stft[:, b:] if a == 0 else stft[:, :-a]
        return data


class AddBackgroundNoiseOnSTFT:
    def __init__(self, bg_dataset, max_percentage: float = 0.45):
        self.bg_dataset = bg_dataset
        self.max_percentage = max_percentage

    def __call__(self, data):
        if not should_apply_transform(data):
            return data
        rng = _rng(data)
        noise = self.bg_dataset[int(rng.integers(len(self.bg_dataset)))][
            "stft"]
        pct = rng.uniform(0, self.max_percentage)
        data["stft"] = data["stft"] * (1 - pct) + noise * pct
        return data


class FixSTFTDimension:
    def __call__(self, data):
        stft = data["stft"]
        t_len, orig = stft.shape[1], data["stft_shape"][1]
        if t_len > orig:
            stft = stft[:, :orig]
        elif t_len < orig:
            stft = np.pad(stft, ((0, 0), (0, orig - t_len)), "constant")
        data["stft"] = stft
        return data


class ToMelSpectrogramFromSTFT:
    def __init__(self, n_mels: int = 32):
        self.n_mels = n_mels

    def __call__(self, data):
        from audiopure_tpu.ops.stft import mel_filterbank

        fb = mel_filterbank(data["n_fft"] // 2 + 1, self.n_mels,
                            data["sample_rate"], norm="slaney",
                            mel_scale="slaney")
        s = fb.T @ (np.abs(data["stft"]) ** 2.0)
        data["mel_spectrogram"] = dsp.power_to_db(s, ref=np.max)
        return data


class DeleteSTFT:
    def __call__(self, data):
        del data["stft"]
        return data


class AudioFromSTFT:
    def __call__(self, data):
        data["istft_samples"] = dsp.istft(
            data["stft"], data["hop_length"],
            dtype=data["samples"].dtype)
        return data
