"""Data layer: WAV I/O roundtrip, numpy DSP identities, datasets on a
synthetic folder tree, loader sampling/sharding/collate."""

import os

import numpy as np
import pytest

from audiopure_tpu.data import (
    BackgroundNoiseDataset,
    DataLoader,
    QualcommKeywordSpottingDataset,
    SC09Dataset,
    SpeechCommandsDataset,
    read_wav,
    write_wav,
)
from audiopure_tpu.data import dsp
from audiopure_tpu.data.datasets import SC09SpectrogramDataset
from audiopure_tpu.data.loader import infinite, rand_audio_length_collate
from audiopure_tpu.data.transforms import (
    ChangeAmplitude,
    Compose,
    FixAudioLength,
    FixSTFTDimension,
    LoadAudio,
    StretchAudioOnSTFT,
    TimeshiftAudio,
    ToMelSpectrogramFromSTFT,
    ToSTFT,
)


@pytest.fixture(scope="module")
def sc09_dir(tmp_path_factory):
    """Synthetic SC09 tree: 10 digit folders x 3 wavs each."""
    root = tmp_path_factory.mktemp("sc09")
    rng = np.random.RandomState(0)
    from audiopure_tpu.data.datasets import SC09_CLASSES
    for c in SC09_CLASSES:
        d = root / c
        d.mkdir()
        for i in range(3):
            write_wav(str(d / f"{i}.wav"),
                      rng.randn(14000).astype(np.float32) * 0.1, 16000)
    bg = root / "_background_noise_"
    bg.mkdir()
    write_wav(str(bg / "noise.wav"),
              rng.randn(48000).astype(np.float32) * 0.05, 16000)
    return str(root)


def test_wav_roundtrip(tmp_path):
    x = (np.sin(2 * np.pi * 440 * np.arange(8000) / 16000) * 0.5
         ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p, sr=16000)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_resample_on_read(tmp_path):
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p, sr=8000)
    assert sr == 8000 and len(y) == 8000
    # tone preserved after resample
    spec = np.abs(np.fft.rfft(y[500:7500]))
    f = np.fft.rfftfreq(7000, 1 / 8000)
    assert abs(f[np.argmax(spec)] - 440) < 5


def test_stft_istft_roundtrip():
    rng = np.random.RandomState(0)
    y = rng.randn(8192).astype(np.float32) * 0.3
    S = dsp.stft(y, 1024, 256)
    y2 = dsp.istft(S, 256, length=len(y))
    np.testing.assert_allclose(y2[512:-512], y[512:-512], atol=1e-3)


def test_time_stretch_changes_length():
    y = np.random.RandomState(0).randn(16000).astype(np.float32)
    y2 = dsp.time_stretch(y, 1.25)
    assert abs(len(y2) - 12800) < 5
    y3 = dsp.time_stretch(y, 0.8)
    assert abs(len(y3) - 20000) < 5


def test_power_to_db_top_db():
    S = np.asarray([[1.0, 1e-12]])
    db = dsp.power_to_db(S, ref=np.max, top_db=80.0)
    assert db[0, 0] == 0.0 and db[0, 1] == -80.0


def test_sc09_dataset_and_caps(sc09_dir):
    ds = SC09Dataset(sc09_dir, transform=Compose(
        [LoadAudio(), FixAudioLength()]))
    assert len(ds) == 30
    item = ds[0]
    assert item["samples"].shape == (16000,)
    assert 0 <= item["target"] < 10
    ds2 = SC09Dataset(sc09_dir, num_per_class=2)
    assert len(ds2) == 20
    w = ds.make_weights_for_balanced_classes()
    assert w.shape == (30,) and np.allclose(w, w[0])  # balanced already


def test_speech_commands_unknown_mapping(sc09_dir):
    ds = SpeechCommandsDataset(sc09_dir, silence_percentage=0.1,
                               add_silence=True)
    # digit folders are not in the 12-class list -> mapped to 'unknown'(=11)
    targets = {t for _, t in ds.data if _}
    assert targets == {11}
    n_silence = sum(1 for p, _ in ds.data if p == "")
    assert n_silence == 3  # 10% of 30
    # reference default: no silence injection (it ships commented out)
    ds2 = SpeechCommandsDataset(sc09_dir)
    assert all(p != "" for p, _ in ds2.data)


def test_background_noise_dataset(sc09_dir):
    bg = BackgroundNoiseDataset(os.path.join(sc09_dir,
                                             "_background_noise_"))
    assert len(bg) == 3  # 48000 samples -> 3 windows of 16000
    assert bg[0]["samples"].shape == (16000,)


def test_qkws_split(tmp_path):
    from audiopure_tpu.data.datasets import QKWS_CLASSES
    root = tmp_path / "qkws"
    for c in QKWS_CLASSES:
        d = root / c
        d.mkdir(parents=True)
        for i in range(150):
            write_wav(str(d / f"{i:03d}.wav"),
                      np.zeros(1000, dtype=np.float32), 16000)
    train = QualcommKeywordSpottingDataset(str(root), split="train")
    valid = QualcommKeywordSpottingDataset(str(root), split="valid")
    test = QualcommKeywordSpottingDataset(str(root), split="test")
    assert len(train) == 4 * 25 and len(valid) == 4 * 100
    assert len(test) == 4 * 25
    paths = {p for p, _ in train.data} | {p for p, _ in valid.data} \
        | {p for p, _ in test.data}
    assert len(paths) == 600  # disjoint cover


def test_loader_batching_shuffle_shard(sc09_dir):
    ds = SC09Dataset(sc09_dir, transform=Compose(
        [LoadAudio(), FixAudioLength()]))
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["samples"].shape == (8, 16000)
    assert batches[0]["target"].shape == (8,)
    # sharding: two shards cover disjoint halves
    a = DataLoader(ds, batch_size=5, num_shards=2, shard_index=0)
    b = DataLoader(ds, batch_size=5, num_shards=2, shard_index=1)
    pa = [p for batch in a for p in batch["path"]]
    pb = [p for batch in b for p in batch["path"]]
    assert set(pa).isdisjoint(pb) and len(pa) + len(pb) == 30


def test_weighted_sampling_balances(sc09_dir):
    ds = SC09Dataset(sc09_dir)
    w = np.ones(len(ds))
    w[:3] = 100.0  # over-sample class 'zero'
    dl = DataLoader(ds, batch_size=30, weights=w, seed=0)
    batch = next(iter(dl))
    zeros = sum(1 for t in batch["target"] if t == 0)
    assert zeros > 15  # heavily oversampled


def test_rand_audio_length_collate():
    rng = np.random.default_rng(0)
    collate = rand_audio_length_collate(rng=rng)
    items = [{"samples": np.ones(30000, dtype=np.float32), "target": 0},
             {"samples": np.ones(5000, dtype=np.float32), "target": 1}]
    batch = collate(items)
    L = batch["samples"].shape[1]
    assert 0.747 * 16000 <= L <= 2.747 * 16000
    assert batch["samples"].shape == (2, L)


def test_stft_transform_pipeline(sc09_dir):
    from audiopure_tpu.data.transforms import DeleteSTFT, ToArray
    pipeline = Compose([
        LoadAudio(), FixAudioLength(), ChangeAmplitude(), TimeshiftAudio(),
        ToSTFT(), StretchAudioOnSTFT(), FixSTFTDimension(),
        ToMelSpectrogramFromSTFT(n_mels=32), DeleteSTFT(),
        ToArray("mel_spectrogram", "input"),
    ])
    ds = SC09Dataset(sc09_dir, transform=pipeline)
    item = ds[5]
    assert item["input"].shape == (32, 32)
    assert np.isfinite(item["input"]).all()


def test_spectrogram_dataset(sc09_dir):
    ds = SC09SpectrogramDataset(sc09_dir, num_per_class=1)
    item = ds[0]
    assert item["spectrogram"].shape == (1, 32, 32)
    # dB values in the melspec_standardize range
    assert item["spectrogram"].min() >= -101.0


def test_infinite_loader(sc09_dir):
    ds = SC09Dataset(sc09_dir)
    it = infinite(DataLoader(ds, batch_size=16, drop_last=True))
    b1, b2, b3 = next(it), next(it), next(it)  # crosses epoch boundary
    assert len(b3["target"]) == 16


def test_bucketed_loader_static_shapes():
    from audiopure_tpu.data.loader import BucketedDataLoader

    rng = np.random.RandomState(0)
    lengths = rng.randint(8000, 44000, size=60)

    class VarDS:
        def __len__(self):
            return len(lengths)

        def __getitem__(self, i):
            return {"samples": np.ones(lengths[i], np.float32),
                    "target": i % 4}

    dl = BucketedDataLoader(VarDS(), batch_size=8, lengths=lengths,
                            n_buckets=4, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == len(dl)

    shapes = set()
    seen = 0
    for b in batches:
        B, L = b["samples"].shape
        shapes.add(L)
        assert L % 128 == 0  # lane-aligned static bucket
        for row, true_len in zip(b["samples"], b["length"]):
            assert true_len <= L
            assert row[:true_len].all()          # payload intact
            assert not row[true_len:].any()      # zero padding
        seen += B
    assert seen == 60                            # every item exactly once
    assert len(shapes) <= 4                      # at most n_buckets compiles
    # buckets actually fit: every item's bucket >= its true length
    for b in batches:
        assert (np.asarray(b["length"]) <= b["samples"].shape[1]).all()
