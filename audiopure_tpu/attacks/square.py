"""Square attack: score-based random search (Andriushchenko et al. 2020).

The reference ships an audio SquareAttack fully commented out
(``white_box_attack.py:737-871``); this is a working 1-D adaptation:
random contiguous segments of the waveform are set to +-eps and kept only
if the margin loss improves — no gradients, only forward queries, which
makes it embarrassingly TPU-friendly (every candidate evaluation is one
batched jitted forward).

Segment length follows the canonical p-schedule (halving at fixed
iteration fractions of the budget), scaled for 1-D signals.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiopure_tpu.attacks.losses import margin_loss

# canonical p-schedule breakpoints (fractions of the iteration budget)
_P_BREAKS = np.asarray([0.0, 0.05, 0.2, 0.5, 0.8, 0.95, 1.0])
_P_FACTORS = np.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.03125])


def _p_for_iter(i: jnp.ndarray, n_iters: int, p_init: float) -> jnp.ndarray:
    frac = i.astype(jnp.float32) / n_iters
    idx = jnp.sum(frac >= jnp.asarray(_P_BREAKS, dtype=jnp.float32)) - 1
    return p_init * jnp.asarray(_P_FACTORS, dtype=jnp.float32)[idx]


class SquareAttack:
    """``SquareAttack(model_fn, ...)(x, y, key) -> (x_adv, success)``.

    model_fn(x, key) -> logits (may be stochastic). Untargeted linf.
    """

    def __init__(self, model_fn: Callable, eps: float = 0.002,
                 n_iters: int = 1000, p_init: float = 0.1,
                 targeted: bool = False):
        self.model_fn = model_fn
        self.eps = float(eps)
        self.n_iters = int(n_iters)
        self.p_init = float(p_init)
        self.targeted = targeted

    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, _, L = x.shape
        eps = self.eps
        sign = -1.0 if self.targeted else 1.0

        def loss_of(x_adv, k):
            scores = self.model_fn(x_adv, k)
            # margin: positive while un-fooled; minimized by the search
            return sign * margin_loss(scores, y, targeted=False,
                                      clip_max=False), scores

        def body(carry, inp):
            delta, best_loss, success = carry
            it, k = inp
            k_pos, k_sign, k_eval = jax.random.split(k, 3)

            p = _p_for_iter(it, self.n_iters, self.p_init)
            s = jnp.maximum((p * L).astype(jnp.int32), 1)
            start = jax.random.randint(k_pos, (B,), 0, L)  # clipped below
            start = jnp.minimum(start, L - s)
            seg_sign = jax.random.choice(
                k_sign, jnp.asarray([-eps, eps]), (B, 1, 1))

            pos = jnp.arange(L)[None, None, :]
            in_seg = jnp.logical_and(pos >= start[:, None, None],
                                     pos < (start + s)[:, None, None])
            cand = jnp.where(in_seg, seg_sign, delta)
            cand = jnp.clip(x + cand, -1.0, 1.0) - x

            cand_loss, scores = loss_of(x + cand, k_eval)
            better = cand_loss < best_loss
            delta = jnp.where(better[:, None, None], cand, delta)
            best_loss = jnp.where(better, cand_loss, best_loss)
            pred = jnp.argmax(scores, -1)
            hit = (pred == y) if self.targeted else (pred != y)
            success = jnp.logical_or(success, jnp.logical_and(hit, better))
            return (delta, best_loss, success), None

        k0, key = jax.random.split(key)
        # vertical-stripe-style init: random sign per position
        delta0 = eps * jax.random.choice(
            k0, jnp.asarray([-1.0, 1.0]), (B, 1, L))
        delta0 = jnp.clip(x + delta0, -1.0, 1.0) - x
        kinit, key = jax.random.split(key)
        init_loss, init_scores = loss_of(x + delta0, kinit)
        pred0 = jnp.argmax(init_scores, -1)
        hit0 = (pred0 == y) if self.targeted else (pred0 != y)

        keys = jax.random.split(key, self.n_iters)
        (delta, _, success), _ = jax.lax.scan(
            body, (delta0, init_loss, hit0),
            (jnp.arange(self.n_iters), keys))
        return x + delta, success

    __call__ = generate
