"""AcousticSystem composite: routing, sample_step averaging, attackability."""

import numpy as np

import jax
import jax.numpy as jnp

from audiopure_tpu import AcousticSystem
from audiopure_tpu.attacks import AudioAttack
from audiopure_tpu.diffusion.vpsde import RevDiffWave

ZERO_EPS = lambda x, t: jnp.zeros_like(x)


def _classifier(w):
    s = jnp.sum(w, axis=tuple(range(1, w.ndim)))
    return jnp.stack([s, -s], axis=1)


def test_sample_step_logit_averaging():
    """sample_step=3 purifier triples the batch; logits come back (B, C)."""
    defender = RevDiffWave(ZERO_EPS, T=50, t=2, sample_step=3)
    system = AcousticSystem(_classifier, None, defender, "wave")
    x = jnp.ones((4, 1, 64)) * 0.01
    logits = system(x, key=jax.random.PRNGKey(0))
    assert logits.shape == (4, 2)


def test_attack_through_sample_step_system():
    """The PGD bookkeeping stays shape-correct with sample_step > 1 (the
    reference silently mis-shapes here)."""
    defender = RevDiffWave(ZERO_EPS, T=50, t=2, sample_step=2)
    system = AcousticSystem(_classifier, None, defender, "wave")
    atk = AudioAttack(lambda x, k: system(x, key=k), eps=0.05,
                      max_iter_1=3)
    x = jnp.ones((2, 1, 64)) * 0.001
    y = jnp.zeros(2, dtype=jnp.int32)
    x_adv, (succ, _) = atk.generate(x, y, jax.random.PRNGKey(1))
    assert x_adv.shape == x.shape
    assert succ.shape == (2,)


def test_defend_false_skips_defender():
    calls = []

    def defender(x, key):
        calls.append(1)
        return x

    system = AcousticSystem(_classifier, None, defender, "wave")
    x = jnp.ones((1, 1, 16))
    system(x, defend=False)
    assert not calls
    system(x, key=jax.random.PRNGKey(0))
    assert calls
