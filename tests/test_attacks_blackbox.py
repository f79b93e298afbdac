"""NES gradient-estimator accuracy and FAKEBOB end-to-end on a linear toy
(analytic optimum; SURVEY.md §4 (c))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.fakebob import FAKEBOB
from audiopure_tpu.attacks.losses import cross_entropy, margin_loss
from audiopure_tpu.attacks.nes import NES


def linear_model(x, key):
    s = jnp.sum(x, axis=(1, 2))
    return jnp.stack([s, -s], axis=1)


@pytest.mark.heavy
def test_nes_estimates_true_gradient():
    """For CE on the linear toy the true grad wrt x is constant; NES with
    many draws should align with it (cosine similarity ~ 1)."""
    x = jnp.ones((2, 1, 32)) * 0.002
    y = jnp.zeros(2, dtype=jnp.int32)

    nes = NES(linear_model, cross_entropy, samples_per_draw=512,
              samples_per_draw_batch=128, sigma=1e-3)
    res = nes(x, y, jax.random.PRNGKey(0))

    true_grad = jax.grad(
        lambda xx: cross_entropy(linear_model(xx, None), y).sum())(x)
    g, t = np.asarray(res.grad).ravel(), np.asarray(true_grad).ravel()
    cos = g @ t / (np.linalg.norm(g) * np.linalg.norm(t))
    assert cos > 0.8, cos
    assert res.adver_loss.shape == (2,)
    assert res.predict.shape == (2,)
    np.testing.assert_array_equal(np.asarray(res.predict), [0, 0])


def test_fakebob_flips_linear_model():
    x = jnp.ones((2, 1, 32)) * 0.0005
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = FAKEBOB(linear_model, epsilon=0.05, max_iter=50,
                  samples_per_draw=64, samples_per_draw_batch_size=64,
                  max_lr=0.01, sigma=1e-3, stop_early=False)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert np.asarray(success).all()
    # margin loss < 0 at the returned best point => prediction flipped
    m = np.asarray(margin_loss(linear_model(x_adv, None), y,
                               clip_max=False))
    assert (m < 0).all()
    # stays in the eps-box
    assert float(jnp.abs(x_adv - x).max()) <= 0.05 + 1e-6


def test_fakebob_eps_box_and_mask_freeze():
    """One easy + one impossible sample: the easy one succeeds and its
    best_adver_x freezes; the hard one stays unsuccessful."""
    x = jnp.concatenate([jnp.ones((1, 1, 32)) * 0.0005,
                         jnp.ones((1, 1, 32)) * 0.5], axis=0)
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = FAKEBOB(linear_model, epsilon=0.01, max_iter=30,
                  samples_per_draw=64, samples_per_draw_batch_size=64,
                  max_lr=0.005, stop_early=False)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(1))
    got = np.asarray(success)
    assert got[0] and not got[1]
    assert float(jnp.abs(x_adv - x).max()) <= 0.01 + 1e-6


def test_fakebob_requires_threshold_for_sv():
    import pytest
    with pytest.raises(NotImplementedError):
        FAKEBOB(linear_model, task="SV")


def test_fakebob_estimate_threshold_osi():
    """Threshold estimation on an OSI toy: the system accepts when
    max-score >= 2.0; the estimator should recover ~that value
    (ref ``estimate_threshold_run``, ``black_box_attack.py:221-311``)."""
    TRUE_T = 2.0

    def model_fn(x, key):
        s = jnp.sum(x, axis=(1, 2))
        return jnp.stack([s, s * 0.5], axis=1)

    def decision_fn(x, key):
        scores = model_fn(x, key)
        mx = scores.max(axis=1)
        return jnp.where(mx >= TRUE_T, jnp.argmax(scores, 1), -1), scores

    atk = FAKEBOB(model_fn, task="OSI", threshold=0.5, epsilon=3.0,
                  max_lr=0.05, samples_per_draw=16,
                  samples_per_draw_batch_size=16)
    x = jnp.ones((1, 1, 64)) * 0.01
    est = atk.estimate_threshold(x, jax.random.PRNGKey(0), decision_fn,
                                 step=3.0, max_outer=50)
    assert est is not None and TRUE_T <= est < TRUE_T * 2
    assert atk.threshold == est

    # CSI task: warning + None (ref ``estimate_threshold:296-299``)
    atk2 = FAKEBOB(model_fn, task="SCR")
    assert atk2.estimate_threshold(x, jax.random.PRNGKey(0),
                                   decision_fn) is None


def test_square_attack_flips_linear_model():
    """Score-based random search fools the toy within the eps box."""
    from audiopure_tpu.attacks.square import SquareAttack

    x = jnp.ones((3, 1, 64)) * 0.0005
    y = jnp.zeros(3, dtype=jnp.int32)
    atk = SquareAttack(linear_model, eps=0.05, n_iters=200, p_init=0.3)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert np.asarray(success).all()
    assert float(jnp.abs(x_adv - x).max()) <= 0.05 + 1e-6
    pred = np.argmax(np.asarray(linear_model(x_adv, None)), axis=1)
    assert (pred == 1).all()


def test_square_attack_impossible_eps():
    from audiopure_tpu.attacks.square import SquareAttack

    x = jnp.ones((2, 1, 64)) * 0.5
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = SquareAttack(linear_model, eps=1e-4, n_iters=50)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert not np.asarray(success).any()
    assert float(jnp.abs(x_adv - x).max()) <= 1e-4 + 1e-7


def test_spsa_attack_flips_linear_model():
    from audiopure_tpu.attacks.spsa import LinfSPSA

    x = jnp.ones((2, 1, 64)) * 0.0005
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = LinfSPSA(linear_model, eps=0.05, n_iters=40, spsa_samples=16,
                   lr=0.02)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert np.asarray(success).all()
    assert float(jnp.abs(x_adv - x).max()) <= 0.05 + 1e-6
    pred = np.argmax(np.asarray(linear_model(x_adv, None)), axis=1)
    assert (pred == 1).all()


def test_siren_attack_flips_linear_model():
    """PSO should easily find the flipping perturbation on the linear toy
    (true margin is linear in sum(delta); eps budget is sufficient)."""
    from audiopure_tpu.attacks.siren import SirenAttack

    x = jnp.ones((2, 1, 32)) * 0.0005
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = SirenAttack(linear_model, epsilon=0.05, max_epoch=3, max_iter=10,
                      n_particles=8)
    x_adv, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert bool(success.all()), success
    # perturbation respects the distortion bounds
    assert float(jnp.max(jnp.abs(x_adv - x))) <= 0.05 + 1e-6
    preds = jnp.argmax(linear_model(x_adv, None), -1)
    np.testing.assert_array_equal(np.asarray(preds), [1, 1])


def test_siren_attack_impossible_eps():
    from audiopure_tpu.attacks.siren import SirenAttack

    x = jnp.ones((2, 1, 32)) * 0.05  # needs delta sum < -1.6, eps too small
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = SirenAttack(linear_model, epsilon=1e-4, max_epoch=2, max_iter=5,
                      n_particles=4)
    _, success = atk.generate(x, y, jax.random.PRNGKey(0))
    assert not bool(success.any())
