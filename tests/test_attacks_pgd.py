"""Attack-logic tests on a linear toy system where PGD/EOT optima are
analytic (SURVEY.md §4 test strategy item (c))."""

import numpy as np

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks import EOT, AudioAttack, cross_entropy
from audiopure_tpu.attacks.losses import majority_vote, margin_loss
from audiopure_tpu.attacks.pgd import lp_norm, project_to_norm_ball


def linear_model(x, key):
    """Deterministic toy: logits = [s, -s], s = sum(x). key unused."""
    s = jnp.sum(x, axis=(1, 2)) * 10.0
    return jnp.stack([s, -s], axis=1)


def noisy_model(x, key):
    s = jnp.sum(x, axis=(1, 2)) * 10.0
    noise = jax.random.normal(key, s.shape) * 0.5
    return jnp.stack([s + noise, -s], axis=1)


def test_projection_linf_and_l2():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 1, 32) * 5)
    p = project_to_norm_ball(x, "linf", 0.1)
    assert float(jnp.abs(p).max()) <= 0.1 + 1e-6
    p2 = project_to_norm_ball(x, "l2", 1.0)
    norms = np.sqrt(np.sum(np.asarray(p2) ** 2, axis=(1, 2)))
    assert (norms <= 1.0 + 1e-5).all()
    # inside-ball points unchanged
    small = x * 1e-4
    np.testing.assert_allclose(project_to_norm_ball(small, "l2", 1.0), small)


def test_eot_mean_converges():
    x = jnp.ones((2, 1, 16)) * 0.01
    y = jnp.zeros(2, dtype=jnp.int32)
    eot = EOT(noisy_model, cross_entropy, eot_size=256, use_grad=False)
    scores, loss, grad, decisions = eot(x, y, jax.random.PRNGKey(0))
    want = np.asarray(linear_model(x, None))
    np.testing.assert_allclose(np.asarray(scores), want, atol=0.1)
    assert grad is None
    assert decisions.shape == (256, 2)


def test_eot_chunked_equals_unchunked_stats():
    x = jnp.ones((2, 1, 16)) * 0.01
    y = jnp.zeros(2, dtype=jnp.int32)
    a = EOT(noisy_model, cross_entropy, eot_size=64, use_grad=True)
    b = EOT(noisy_model, cross_entropy, eot_size=64, chunk=16, use_grad=True)
    sa, la, ga, _ = a(x, y, jax.random.PRNGKey(1))
    sb, lb, gb, _ = b(x, y, jax.random.PRNGKey(1))
    # same keys, same replica set -> identical results
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


def test_pgd_linf_flips_linear_model():
    """Untargeted linf PGD on the toy: drives sum(x) negative and
    saturates delta at -eps everywhere (constant gradient direction)."""
    x = jnp.ones((3, 1, 64)) * 0.001
    y = jnp.zeros(3, dtype=jnp.int32)  # true class 0 (s > 0)
    atk = AudioAttack(linear_model, eps=0.01, norm="linf", max_iter_1=20)
    x_adv, (succ, _) = atk.generate(x, y, jax.random.PRNGKey(0))
    assert np.asarray(succ).all()
    delta = np.asarray(x_adv - x)
    np.testing.assert_allclose(delta, -0.01, atol=1e-6)
    pred = np.argmax(np.asarray(linear_model(x_adv, None)), axis=1)
    assert (pred == 1).all()


def test_pgd_respects_eps_and_clip():
    x = jnp.full((2, 1, 32), -0.9995)
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = AudioAttack(linear_model, eps=0.01, norm="linf", max_iter_1=10)
    x_adv, _ = atk.generate(x, y, jax.random.PRNGKey(0))
    assert float(jnp.abs(x_adv - x).max()) <= 0.01 + 1e-6
    assert float(x_adv.min()) >= -1.0 - 1e-6  # [-1,1] clamp active


def test_pgd_l2_norm_bound():
    x = jnp.ones((2, 1, 64)) * 0.001
    y = jnp.zeros(2, dtype=jnp.int32)
    atk = AudioAttack(linear_model, eps=0.05, norm="l2", max_iter_1=15)
    x_adv, (succ, _) = atk.generate(x, y, jax.random.PRNGKey(0))
    norms = np.sqrt(np.sum(np.asarray(x_adv - x) ** 2, axis=(1, 2)))
    assert (norms <= 0.05 + 1e-5).all()
    assert np.asarray(succ).all()


def test_pgd_targeted_mode():
    x = jnp.ones((2, 1, 64)) * 0.001  # predicted class 0
    y_target = jnp.ones(2, dtype=jnp.int32)  # push to class 1
    atk = AudioAttack(linear_model, eps=0.01, norm="linf", max_iter_1=20)
    x_adv, (succ, _) = atk.generate(x, y_target, jax.random.PRNGKey(0),
                                    targeted=True)
    pred = np.argmax(np.asarray(linear_model(x_adv, None)), axis=1)
    assert (pred == 1).all() and np.asarray(succ).all()


def test_pgd_unsuccessful_returns_perturbed():
    """eps too small to flip: success False, x_adv == final x+delta != x.

    (x kept small so the CE gradient doesn't underflow in f32 — with
    saturated logits even the torch reference gets exact-zero grads.)"""
    x = jnp.ones((1, 1, 64)) * 0.01
    y = jnp.zeros(1, dtype=jnp.int32)
    atk = AudioAttack(linear_model, eps=1e-5, norm="linf", max_iter_1=5)
    x_adv, (succ, _) = atk.generate(x, y, jax.random.PRNGKey(0))
    assert not np.asarray(succ).any()
    assert not np.allclose(np.asarray(x_adv), np.asarray(x))


def test_margin_loss_csi():
    scores = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 3.0, 1.0]])
    y = jnp.asarray([0, 2])
    # untargeted: score_real + conf - score_other
    got = np.asarray(margin_loss(scores, y, targeted=False, clip_max=False))
    np.testing.assert_allclose(got, [2.0 - 1.0, 1.0 - 3.0], atol=1e-6)
    got_c = np.asarray(margin_loss(scores, y, targeted=False, clip_max=True))
    np.testing.assert_allclose(got_c, [1.0, 0.0], atol=1e-6)


def test_majority_vote():
    decisions = jnp.asarray([[0, 1], [0, 2], [1, 2], [0, 2]])
    got = np.asarray(majority_vote(decisions, 3))
    np.testing.assert_array_equal(got, [0, 2])


def test_predict_model_fn_value_identical():
    """A value-identical predict_model_fn must not change the attack
    output (the CLI uses a forward-only eps-net for the prediction pass
    when grad_mode='full')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.attacks import AudioAttack

    proj = jax.random.normal(jax.random.PRNGKey(0), (64, 4))

    def model_fn(x, key):
        h = jnp.tanh(x[:, 0, :64] @ proj)
        return h + 0.01 * jax.random.normal(key, h.shape)

    # same values, different callable (wrapped with stop_gradient, as a
    # grad_mode='ref' system would be)
    predict_fn = lambda x, key: jax.lax.stop_gradient(model_fn(x, key))

    x = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 100)) * 0.1
    y = jnp.zeros((3,), jnp.int32)
    a1 = AudioAttack(model_fn, eps=0.01, max_iter_1=4)
    a2 = AudioAttack(model_fn, eps=0.01, max_iter_1=4,
                     predict_model_fn=predict_fn)
    out1 = a1.generate(x, y, jax.random.PRNGKey(2))
    out2 = a2.generate(x, y, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1][0]),
                                  np.asarray(out2[1][0]))


def test_share_eot_matches_on_deterministic_system():
    """On a deterministic system the shared-EOT trajectory is identical
    to the reference two-stack pairing: same point, same scores, same
    gradient -> same delta updates and bookkeeping."""
    x = jnp.ones((3, 1, 64)) * 0.001
    y = jnp.zeros(3, dtype=jnp.int32)
    a = AudioAttack(linear_model, eps=0.01, norm="linf", max_iter_1=15,
                    eot_attack_size=2, eot_defense_size=2)
    b = AudioAttack(linear_model, eps=0.01, norm="linf", max_iter_1=15,
                    eot_attack_size=2, eot_defense_size=2, share_eot=True)
    xa, (sa, _) = a.generate(x, y, jax.random.PRNGKey(3))
    xb, (sb, _) = b.generate(x, y, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_share_eot_flips_noisy_system():
    """Shared mode still succeeds on a stochastic system (the estimator
    is unchanged: mean over eot_size fresh draws at x+delta)."""
    x = jnp.ones((3, 1, 64)) * 0.001
    y = jnp.zeros(3, dtype=jnp.int32)
    atk = AudioAttack(noisy_model, eps=0.01, norm="linf", max_iter_1=25,
                      eot_attack_size=8, eot_defense_size=8,
                      share_eot=True)
    x_adv, (succ, _) = atk.generate(x, y, jax.random.PRNGKey(0))
    assert np.asarray(succ).all()
    assert float(jnp.abs(x_adv - x).max()) <= 0.01 + 1e-6


def test_share_eot_requires_equal_sizes():
    import pytest
    with pytest.raises(ValueError):
        AudioAttack(linear_model, eot_attack_size=4, eot_defense_size=2,
                    share_eot=True)


def test_pair_fused_matches_two_pass_exactly():
    """pair_fused is the exact-pairing estimator on a different compute
    schedule: with the same key it must reproduce the default two-pass
    trajectory on a STOCHASTIC system (same key split -> same draws ->
    same predictions and gradient means)."""
    x = jnp.ones((3, 1, 64)) * 0.001
    y = jnp.zeros(3, dtype=jnp.int32)
    kw = dict(eps=0.01, norm="linf", max_iter_1=12, eot_attack_size=4,
              eot_defense_size=4)
    a = AudioAttack(noisy_model, **kw)
    b = AudioAttack(noisy_model, pair_fused=True, **kw)
    xa, (sa, _) = a.generate(x, y, jax.random.PRNGKey(5))
    xb, (sb, _) = b.generate(x, y, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_pair_fused_option_validation():
    import pytest
    with pytest.raises(ValueError):
        AudioAttack(linear_model, eot_attack_size=4, eot_defense_size=2,
                    pair_fused=True)
    with pytest.raises(ValueError):
        AudioAttack(linear_model, eot_attack_size=4, eot_defense_size=4,
                    pair_fused=True, share_eot=True)


def test_segmented_matches_monolithic_exactly():
    """segment_iters splits the PGD scan into several dispatches with
    the carry passed between them; the trajectory must be bit-identical
    to the monolithic program on a STOCHASTIC system (same key split,
    same body) for every schedule mode, including a non-dividing
    segment length (remainder segment)."""
    x = jnp.ones((3, 1, 64)) * 0.001
    y = jnp.zeros(3, dtype=jnp.int32)
    for extra in ({}, {"pair_fused": True}, {"share_eot": True}):
        kw = dict(eps=0.01, norm="linf", max_iter_1=11,
                  eot_attack_size=3, eot_defense_size=3, **extra)
        mono = AudioAttack(noisy_model, **kw)
        seg = AudioAttack(noisy_model, segment_iters=4, **kw)  # 4+4+3
        xa, (sa, _) = mono.generate(x, y, jax.random.PRNGKey(7))
        xb, (sb, _) = seg.generate(x, y, jax.random.PRNGKey(7))
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-6, err_msg=str(extra))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_segment_iters_noop_when_covering():
    """segment_iters >= max_iter_1 keeps the monolithic single-program
    path (no behavior or cache-shape change)."""
    x = jnp.ones((2, 1, 32)) * 0.001
    y = jnp.zeros(2, dtype=jnp.int32)
    a = AudioAttack(linear_model, eps=0.01, max_iter_1=5)
    b = AudioAttack(linear_model, eps=0.01, max_iter_1=5,
                    segment_iters=9)
    xa, _ = a.generate(x, y, jax.random.PRNGKey(1))
    xb, _ = b.generate(x, y, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb))
    assert ("mono", False) in b._stage1_cache
