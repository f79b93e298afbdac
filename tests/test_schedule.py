"""Schedule math vs closed form and vs a sequential-fp32 reference loop
(reference semantics: ``DiffWave_Unconditional/util.py:96-123``)."""

import numpy as np

from audiopure_tpu.diffusion.schedule import (
    diffusion_step_embedding,
    make_schedule,
)


def _reference_tables(T, beta_0, beta_T):
    beta = np.linspace(beta_0, beta_T, T, dtype=np.float32)
    alpha = 1 - beta
    alpha_bar = alpha.copy()
    beta_tilde = beta.copy()
    for t in range(1, T):
        alpha_bar[t] *= alpha_bar[t - 1]
        beta_tilde[t] *= (1 - alpha_bar[t - 1]) / (1 - alpha_bar[t])
    sigma = np.sqrt(beta_tilde)
    return beta, alpha, alpha_bar, sigma


def test_schedule_matches_reference_loop():
    sched = make_schedule(200, 1e-4, 0.02)
    beta, alpha, alpha_bar, sigma = _reference_tables(200, 1e-4, 0.02)
    np.testing.assert_allclose(sched.beta, beta, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha, alpha, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha_bar, alpha_bar, rtol=1e-5)
    np.testing.assert_allclose(sched.sigma, sigma, rtol=1e-4)


def test_schedule_shapes_and_monotonicity():
    sched = make_schedule(1000, 0.1 / 1000, 20.0 / 1000)
    assert sched.beta.shape == (1000,)
    ab = np.asarray(sched.alpha_bar)
    assert np.all(np.diff(ab) < 0) and ab[0] < 1.0 and ab[-1] > 0.0


def test_step_embedding_matches_formula():
    t = np.array([[0.0], [17.0], [199.0]], dtype=np.float32)
    emb = np.asarray(diffusion_step_embedding(t, 128))
    assert emb.shape == (3, 128)
    half = 64
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    want = np.concatenate([np.sin(t * freqs), np.cos(t * freqs)], axis=1)
    # atol covers f32 sin/cos of large arguments vs f64 numpy
    np.testing.assert_allclose(emb, want.astype(np.float32), atol=5e-4)
    # t=0: sin part zero, cos part one
    np.testing.assert_allclose(emb[0, :half], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, half:], 1.0, atol=1e-7)
