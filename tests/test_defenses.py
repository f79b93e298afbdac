"""Classical defenses: IIR vs scipy golden, median/mean filters vs scipy,
resampler behavior, BPDA gradients, certification statistics."""

import numpy as np
import pytest
from scipy import signal as ss

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.bpda import bpda
from audiopure_tpu.certify import RobustCertificate, clopper_pearson_lower
from audiopure_tpu.defenses import FreqDomainDefense, TimeDomainDefense
from audiopure_tpu.defenses.time_defense import AS, AT, MS, QT
from audiopure_tpu.ops.iir import butter_lowpass, lfilter
from audiopure_tpu.ops.resample import resample


def test_lfilter_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 500).astype(np.float32)
    b, a = butter_lowpass()
    got = np.asarray(lfilter(b, a, jnp.asarray(x)))
    want = ss.lfilter(b, a, x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_lfilter_fir_case():
    """Pure FIR (a=[1]) reduces to convolution."""
    x = np.zeros((1, 32), dtype=np.float32)
    x[0, 3] = 1.0
    b = np.array([0.5, 0.25, 0.125])
    got = np.asarray(lfilter(b, np.array([1.0]), jnp.asarray(x)))
    want = ss.lfilter(b, [1.0], x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_as_matches_uniform_filter():
    x = np.random.RandomState(1).randn(2, 1, 100).astype(np.float32)
    got = np.asarray(AS(jnp.asarray(x), 3))
    want = ss.lfilter([1 / 3, 1 / 3, 1 / 3], [1.0], np.pad(
        x, ((0, 0), (0, 0), (1, 1))), axis=-1)[..., 2:]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ms_median():
    x = jnp.asarray([[1.0, 5.0, 2.0, 8.0, 3.0]])
    got = np.asarray(MS(x, 3))
    # zero-padded windows: [0,1,5],[1,5,2],[5,2,8],[2,8,3],[8,3,0]
    np.testing.assert_allclose(got[0], [1, 2, 5, 3, 3])


def test_at_snr():
    x = jnp.asarray(np.random.RandomState(0).randn(8, 1, 16000)
                    .astype(np.float32))
    out = AT(x, jax.random.PRNGKey(0), param=25.0)
    noise = np.asarray(out - x)
    sig_p = np.mean(np.asarray(x) ** 2)
    noise_p = np.mean(noise ** 2)
    snr_db = 10 * np.log10(sig_p / noise_p)
    assert abs(snr_db - 25.0) < 1.0


def test_qt_rounds_and_has_straight_through_grad():
    x = jnp.asarray([[0.5, -0.25, 0.1]])
    out = QT(x, 128, 16)
    q = 128 / 2 ** 15
    np.testing.assert_allclose(np.asarray(out),
                               np.round(np.asarray(x) / q) * q, atol=1e-6)
    g = jax.grad(lambda xx: jnp.sum(QT(xx, 128, 16)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # identity gradient


def test_bpda_custom_sub():
    f = bpda(lambda x: jnp.round(x), lambda x: 2.0 * x)
    g = jax.grad(lambda x: jnp.sum(f(x)))(jnp.asarray([0.3, 1.7]))
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_resample_preserves_tone():
    """A 1 kHz tone survives 16k->8k->16k; a 7.5 kHz tone is killed."""
    t = np.arange(16000) / 16000.0
    lo = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    hi = np.sin(2 * np.pi * 7500 * t).astype(np.float32)[None]
    fd = FreqDomainDefense("DS")
    out_lo = np.asarray(fd(jnp.asarray(lo)))[0, 1000:15000]
    out_hi = np.asarray(fd(jnp.asarray(hi)))[0, 1000:15000]
    assert np.std(out_lo) > 0.5  # tone survives
    assert np.std(out_hi) < 0.1  # above new nyquist: removed


def test_resample_length():
    x = jnp.zeros((2, 1, 16000))
    y = resample(x, 16000, 8000)
    assert y.shape == (2, 1, 8000)
    z = resample(y, 8000, 16000)
    assert z.shape == (2, 1, 16000)


def test_lpf_removes_high_freq():
    t = np.arange(16000) / 16000.0
    x = (np.sin(2 * np.pi * 500 * t)
         + np.sin(2 * np.pi * 7000 * t)).astype(np.float32)[None]
    out = np.asarray(FreqDomainDefense("LPF")(jnp.asarray(x) * 0.4))[0]
    spec = np.abs(np.fft.rfft(out[4000:12000]))
    freqs = np.fft.rfftfreq(8000, 1 / 16000)
    hi_band = spec[(freqs > 6500) & (freqs < 7500)].max()
    lo_band = spec[(freqs > 400) & (freqs < 600)].max()
    # the reference's buttord(0.5, 1.0, ...) design degenerates to 1st
    # order (ws at Nyquist), so attenuation at 7 kHz is mild — this matches
    # scipy.signal.lfilter with the same (b, a) to 3e-8.
    assert hi_band < 0.3 * lo_band


def test_dispatchers_and_names():
    assert TimeDomainDefense("AS")._get_name() == "Average_Smoothing"
    assert FreqDomainDefense("BPF")._get_name() == "Band_Pass_Filter"
    with pytest.raises(NotImplementedError):
        TimeDomainDefense("XX")


def test_clopper_pearson():
    # known value: k=n -> lower bound = alpha^(1/n)
    n = 100
    assert abs(clopper_pearson_lower(n, n, 0.001) - 0.001 ** (1 / n)) < 1e-9
    assert clopper_pearson_lower(0, 100) == 0.0
    # monotone in k
    vals = [clopper_pearson_lower(k, 100) for k in (50, 70, 90)]
    assert vals[0] < vals[1] < vals[2]


def test_certify_on_linear_classifier():
    """A margin-classifier smoothed with sigma: certify returns the true
    class with positive radius for well-separated points."""
    classifier = lambda x: jnp.stack(
        [jnp.mean(x, axis=(1, 2)), -jnp.mean(x, axis=(1, 2))], axis=1)
    rc = RobustCertificate(classifier, transform=None, denoiser=None,
                           num_classes=2)
    x = jnp.ones((2, 1, 64)) * 1.0
    y = jnp.zeros(2, dtype=jnp.int32)
    res = rc.certify(x, y, jax.random.PRNGKey(0), sigma=0.25, n_0=32,
                     n=256, alpha=0.01)
    assert (res.prediction == 0).all()
    assert (res.radius > 0).all()
    assert RobustCertificate.certified_robust_correct(
        res.prediction, np.asarray(y), res.radius, r=0.0) == 2
