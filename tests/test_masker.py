"""Psychoacoustic masker sanity: tone masking, ATH shape, threshold
structure; stage-2 smoke test on the linear toy."""

import numpy as np

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.imperceptible import (approximate_psd,
                                                 masking_hinge_loss, stage_2)
from audiopure_tpu.attacks.losses import cross_entropy
from audiopure_tpu.attacks.masker import PsychoacousticMasker


def test_psd_normalization():
    m = PsychoacousticMasker()
    t = np.arange(16000) / 16000.0
    audio = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    psd, psd_max = m.power_spectral_density(audio)
    assert psd.shape == (1025, 1 + (16000 - 2048) // 512)
    assert abs(psd.max() - 96.0) < 1e-4  # normalized at 96 dB


def test_masker_finds_tone():
    m = PsychoacousticMasker()
    t = np.arange(16000) / 16000.0
    audio = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    psd, _ = m.power_spectral_density(audio)
    maskers, idx = m.filter_maskers(*m.find_maskers(psd[:, 5]))
    freqs = m.fft_frequencies[idx]
    assert np.any(np.abs(freqs - 1000) < 20)  # the tone is a masker


def test_threshold_peaks_near_masker():
    m = PsychoacousticMasker()
    t = np.arange(16000) / 16000.0
    audio = (0.5 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
    thr, psd_max = m.calculate_threshold_and_psd_maximum(audio)
    assert thr.shape[0] == 1025 and np.isfinite(thr).all()
    f = m.fft_frequencies
    mid = thr[:, thr.shape[1] // 2]
    # threshold near the tone dominates threshold two octaves away
    near = mid[np.argmin(np.abs(f - 2000))]
    far = mid[np.argmin(np.abs(f - 7500))]
    assert near > far


def test_approximate_psd_shapes_and_hinge():
    pert = jnp.asarray(np.random.RandomState(0).randn(2, 16000)
                       .astype(np.float32) * 1e-3)
    psd_max = jnp.asarray([1e9, 1e9])
    psd = approximate_psd(pert, psd_max)
    assert psd.shape == (2, 1025, 28)
    thr = jnp.ones((2, 1025, 28)) * 1e6
    loss = masking_hinge_loss(pert, thr, psd_max)
    assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()
    g = jax.grad(lambda p: masking_hinge_loss(p, thr * 0, psd_max).sum())(
        pert)
    assert np.abs(np.asarray(g)).max() > 0


def test_stage2_reduces_masking_violation():
    """Stage 2 on an always-fooled model: perturbation PSD should shrink
    toward the masking threshold while staying adversarial."""
    def model_fn(x, key):
        s = jnp.sum(x, axis=(1, 2))
        return jnp.stack([s - 1e3, -s + 1e3], axis=1)  # always class 1

    x = jnp.asarray((0.3 * np.sin(2 * np.pi * 500 *
                                  np.arange(16000) / 16000.0))
                    .astype(np.float32))[None, None]
    x_adv0 = x + 0.01 * jax.random.normal(jax.random.PRNGKey(0), x.shape)
    y = jnp.zeros(1, dtype=jnp.int32)

    masker = PsychoacousticMasker()
    x_imp, success = stage_2(model_fn, cross_entropy, masker, x, x_adv0, y,
                             jax.random.PRNGKey(1), max_iter=30)
    assert bool(success[0])
    assert x_imp.shape == x.shape
    assert np.isfinite(np.asarray(x_imp)).all()
