"""Mel front-end golden tests.

STFT is validated against ``torch.stft`` (the exact primitive the reference's
torchaudio MelSpectrogram uses, ``adaptive_attack_eval.py:83``); the mel
filterbank against hand-computed Slaney/HTK formulas and triangle invariants.
"""

import numpy as np
import pytest
import torch

from audiopure_tpu.ops.stft import (
    MelFrontEnd,
    amplitude_to_db,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    stft_power,
)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    return (rng.randn(2, 16000) * 0.1).astype(np.float32)


def _torch_stft_power(x, n_fft=2048, hop=512):
    spec = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
        window=torch.hann_window(n_fft), center=True, pad_mode="constant",
        return_complex=True,
    )
    return (spec.abs() ** 2).numpy()


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_stft_power_matches_torch(wave, method):
    got = np.asarray(stft_power(wave, 2048, 512, method=method))
    want = _torch_stft_power(wave)
    assert got.shape == want.shape == (2, 1025, 32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_hann_window_periodic():
    np.testing.assert_allclose(
        hann_window(512), torch.hann_window(512).numpy(), atol=1e-6
    )


def test_mel_filterbank_slaney_properties():
    fb = mel_filterbank(1025, 32, 16000, norm="slaney", mel_scale="slaney")
    assert fb.shape == (1025, 32)
    assert np.all(fb >= 0)
    # each filter is a normalized triangle: area*2/width == peak scaling
    assert np.all(fb.sum(axis=0) > 0)
    # unnormalized version: triangle peaks ~1
    fb_un = mel_filterbank(1025, 32, 16000, norm=None, mel_scale="slaney")
    assert 0.8 < fb_un.max() <= 1.0 + 1e-6


def test_mel_scales_differ():
    fb_s = mel_filterbank(1025, 32, 16000, norm="slaney", mel_scale="slaney")
    fb_h = mel_filterbank(1025, 32, 16000, norm="slaney", mel_scale="htk")
    assert not np.allclose(fb_s, fb_h)


def test_mel_spectrogram_shape_and_db(wave):
    mel = np.asarray(mel_spectrogram(wave[:, None, :]))
    assert mel.shape == (2, 1, 32, 32)
    db = np.asarray(amplitude_to_db(mel))
    assert np.all(db >= -100.0 - 1e-5)  # amin=1e-10 -> floor at -100 dB
    fe = MelFrontEnd()
    out = np.asarray(fe(wave[:, None, :]))
    np.testing.assert_allclose(out, db, atol=1e-5)


def test_front_end_is_differentiable(wave):
    import jax
    import jax.numpy as jnp

    fe = MelFrontEnd()
    g = jax.grad(lambda x: jnp.sum(fe(x)))(wave[:1, None, :])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
