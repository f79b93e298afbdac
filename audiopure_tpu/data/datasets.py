"""Folder-per-class audio datasets.

Rebuild of ``datasets/sc_dataset.py:19-178``,
``datasets/qualcomm_kws_dataset.py:9-115`` and the spectrogram dataset
(``improved_diffusion/sc09_spectrogram_dataset.py:166-261``), minus torch:
items are the same dicts ``{'path','target','samples','sample_rate'}``;
batching lives in ``data/loader.py``.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from audiopure_tpu.data.wavio import read_wav

CLASSES = "unknown, silence, yes, no, up, down, left, right, on, off, " \
    "stop, go".split(", ")
SC09_CLASSES = "zero, one, two, three, four, five, six, seven, eight, " \
    "nine".split(", ")
QKWS_CLASSES = "hey_android, hey_snapdragon, hi_galaxy, hi_lumina".split(
    ", ")


class _FolderDataset:
    """Shared folder-per-class scaffolding."""

    def __init__(self, folder: str, transform: Optional[Callable],
                 classes: Sequence[str]):
        self.classes = list(classes)
        self.transform = transform
        self.data: List[Tuple[str, int]] = []
        self.folder = folder

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        path, target = self.data[index]
        data = {"path": path, "target": target}
        if self.transform is not None:
            data = self.transform(data)
        return data

    def make_weights_for_balanced_classes(self) -> np.ndarray:
        """Inverse-frequency per-example weights
        (ref ``sc_dataset.py:71-84``)."""
        count = np.zeros(len(self.classes))
        for _, target in self.data:
            count[target] += 1
        weight_per_class = float(count.sum()) / np.maximum(count, 1)
        return np.asarray([weight_per_class[t] for _, t in self.data])


class SpeechCommandsDataset(_FolderDataset):
    """12-class Speech Commands: 10 known words + unknown + silence
    (ref ``sc_dataset.py:19-84``). Classes not in the known list map to
    'unknown' (last index)."""

    def __init__(self, folder: str, transform=None,
                 classes: Sequence[str] = CLASSES,
                 silence_percentage: float = 0.1,
                 add_silence: bool = False):
        super().__init__(folder, transform, classes)
        all_classes = [d for d in os.listdir(folder)
                       if os.path.isdir(os.path.join(folder, d))
                       and not d.startswith("_")]
        class_to_idx = {c: i for i, c in enumerate(classes)}
        for c in all_classes:
            if c not in class_to_idx:
                class_to_idx[c] = len(classes) - 1
        for c in sorted(all_classes):
            d = os.path.join(folder, c)
            target = class_to_idx[c]
            for f in sorted(os.listdir(d)):
                self.data.append((os.path.join(d, f), target))
        # silence injection (empty path -> LoadAudio emits zeros). The
        # reference ships this commented out (``sc_dataset.py:53-55``), so
        # it is opt-in here for parity.
        if add_silence:
            target = class_to_idx.get("silence", 1)
            n_silence = int(len(self.data) * silence_percentage)
            self.data += [("", target)] * n_silence


class SC09Dataset(_FolderDataset):
    """Digits zero..nine with per-class cap (ref ``sc_dataset.py:87-139``)."""

    def __init__(self, folder: str, transform=None,
                 classes: Sequence[str] = SC09_CLASSES,
                 num_per_class: int = -1):
        super().__init__(folder, transform, classes)
        class_to_idx = {c: i for i, c in enumerate(classes)}
        for c in classes:
            d = os.path.join(folder, c)
            if not os.path.isdir(d):
                continue
            files = sorted(os.listdir(d))
            if num_per_class > 0:
                files = files[:num_per_class]
            for f in files:
                self.data.append((os.path.join(d, f), class_to_idx[c]))


class QualcommKeywordSpottingDataset(_FolderDataset):
    """4 keyword classes with tail-split Train/Valid/Test
    (ref ``qualcomm_kws_dataset.py:9-115``: per speaker dir, Train =
    [:-125], Valid = [-125:-25], Test = [-25:])."""

    def __init__(self, folder: str, transform=None,
                 classes: Sequence[str] = QKWS_CLASSES,
                 split: Optional[str] = None):
        super().__init__(folder, transform, classes)
        class_to_idx = {c: i for i, c in enumerate(classes)}
        for c in classes:
            d = os.path.join(folder, c)
            if not os.path.isdir(d):
                continue
            files = [os.path.join(d, f) for f in sorted(os.listdir(d))]
            if split == "train":
                files = files[:-125]
            elif split == "valid":
                files = files[-125:-25]
            elif split == "test":
                files = files[-25:]
            for f in files:
                self.data.append((f, class_to_idx[c]))


class BackgroundNoiseDataset:
    """Silence/background noise chopped into fixed-length windows
    (ref ``sc_dataset.py:149-178``)."""

    def __init__(self, folder: str, transform=None, sample_rate: int = 16000,
                 sample_length: float = 1.0):
        samples = []
        for f in sorted(os.listdir(folder)):
            path = os.path.join(folder, f)
            if os.path.isfile(path) and f.endswith(".wav"):
                s, _ = read_wav(path, sr=sample_rate)
                samples.append(s)
        samples = np.hstack(samples) if samples else np.zeros(
            int(sample_rate * sample_length), dtype=np.float32)
        c = int(sample_rate * sample_length)
        r = max(len(samples) // c, 1)
        samples = np.pad(samples, (0, max(0, r * c - len(samples))))
        self.samples = samples[: r * c].reshape(-1, c)
        self.sample_rate = sample_rate
        self.transform = transform
        self.path = folder
        self.classes = CLASSES

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        data = {"samples": self.samples[index],
                "sample_rate": self.sample_rate, "target": 1,
                "path": self.path}
        if self.transform is not None:
            data = self.transform(data)
        return data


class SC09SpectrogramDataset(SC09Dataset):
    """wav -> (1, 32, 32) log-mel for diffusion training
    (ref ``sc09_spectrogram_dataset.py:166-261``): LoadAudio +
    FixAudioLength + device-identical mel + AmplitudeToDB, standardized by
    the trainer with ``melspec_standardize``."""

    def __init__(self, folder: str, classes=SC09_CLASSES,
                 num_per_class: int = -1, n_mels: int = 32,
                 class_cond: bool = False):
        from audiopure_tpu.data.transforms import (Compose, FixAudioLength,
                                                   LoadAudio)
        super().__init__(folder, Compose([LoadAudio(), FixAudioLength()]),
                         classes, num_per_class)
        self.n_mels = n_mels
        self.class_cond = class_cond

    def __getitem__(self, index):
        from audiopure_tpu.ops.stft import amplitude_to_db, mel_spectrogram

        data = super().__getitem__(index)
        mel = np.asarray(amplitude_to_db(
            mel_spectrogram(data["samples"][None, :], n_mels=self.n_mels)))
        out = {"spectrogram": mel.astype(np.float32),  # (1, n_mels, T)
               "target": data["target"]}
        return out
