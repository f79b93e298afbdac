"""Native C++ WAV loader: parity with the Python reader, batch decode,
DataLoader integration, graceful failure paths."""

import os
import time

import numpy as np
import pytest

from audiopure_tpu.data import write_wav
from audiopure_tpu.data import native
from audiopure_tpu.data.wavio import read_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(16):
        p = str(d / f"{i}.wav")
        write_wav(p, rng.randn(12000 + 100 * i).astype(np.float32) * 0.3,
                  16000)
        paths.append(p)
    return paths


def test_native_available():
    assert native.available(), "C++ wavloader failed to build/load"


def test_native_matches_python(wav_dir):
    p = wav_dir[0]
    got, sr = native.decode_wav(p, 16000)
    want, _ = read_wav(p)
    want = np.pad(want, (0, 16000 - len(want)))
    assert sr == 16000
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_batch_decode(wav_dir):
    out = native.decode_batch(wav_dir, 16000, n_threads=4)
    assert out.shape == (16, 16000)
    for i, p in enumerate(wav_dir):
        want, _ = read_wav(p)
        want = np.pad(want[:16000], (0, max(0, 16000 - len(want))))
        np.testing.assert_allclose(out[i], want, atol=1e-6)


def test_native_truncation(wav_dir):
    got, _ = native.decode_wav(wav_dir[5], 4000)
    want, _ = read_wav(wav_dir[5])
    np.testing.assert_allclose(got, want[:4000], atol=1e-6)


def test_native_missing_file():
    assert native.decode_wav("/nonexistent/x.wav", 100) is None
    assert native.decode_batch(["/nonexistent/x.wav"], 100) is None


def test_native_batch_loader_with_dataloader(wav_dir, tmp_path):
    from audiopure_tpu.data import DataLoader, SC09Dataset
    from audiopure_tpu.data.datasets import SC09_CLASSES
    from audiopure_tpu.data.native import NativeBatchLoader

    root = tmp_path / "sc"
    rng = np.random.RandomState(1)
    for c in SC09_CLASSES[:3]:
        (root / c).mkdir(parents=True)
        write_wav(str(root / c / "a.wav"),
                  rng.randn(15000).astype(np.float32) * 0.2, 16000)
    ds = SC09Dataset(str(root))  # no transform: native loader decodes
    dl = DataLoader(ds, batch_size=3,
                    collate_fn=NativeBatchLoader(16000, n_threads=2))
    batch = next(iter(dl))
    assert batch["samples"].shape == (3, 16000)
    assert np.abs(batch["samples"]).max() > 0.01
    np.testing.assert_allclose(batch["samples"][:, 15000:], 0.0)
