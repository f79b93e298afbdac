"""Linf-SPSA attack (Uesato et al. 2018).

The reference ships LinfSPSA fully commented out
(``white_box_attack.py:874-1003``); this is a working version: gradients
are estimated with simultaneous perturbation (Rademacher directions,
antithetic central differences), stepped with Adam, projected to the linf
ball. Pure forward queries — the SPSA sample axis is a vmap, so every step
is one batched compiled program.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from audiopure_tpu.attacks.losses import margin_loss


class LinfSPSA:
    """``LinfSPSA(model_fn, ...)(x, y, key) -> (x_adv, success)``.

    model_fn(x, key) -> logits (may be stochastic). Untargeted by default:
    maximizes the CW margin via SPSA-estimated gradients.
    """

    def __init__(self, model_fn: Callable, eps: float = 0.002,
                 n_iters: int = 100, spsa_samples: int = 32,
                 delta: float = 0.01, lr: float = 0.01,
                 targeted: bool = False):
        assert spsa_samples % 2 == 0
        self.model_fn = model_fn
        self.eps = float(eps)
        self.n_iters = int(n_iters)
        self.spsa_samples = int(spsa_samples)
        self.delta = float(delta)
        self.lr = float(lr)
        self.targeted = targeted

    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        eps, delta = self.eps, self.delta
        half = self.spsa_samples // 2
        opt = optax.adam(self.lr)

        def loss_of(x_adv, k):
            scores = self.model_fn(x_adv, k)
            # minimize the (un-clipped) margin => cross the boundary
            return margin_loss(scores, y, targeted=self.targeted,
                               clip_max=False), scores

        def spsa_grad(d, k):
            k_dir, k_eval = jax.random.split(k)
            v = jax.random.rademacher(
                k_dir, (half, *x.shape), dtype=x.dtype)

            def probe(vk, kk):
                lp, _ = loss_of(jnp.clip(x + d + delta * vk, -1, 1), kk)
                lm, _ = loss_of(jnp.clip(x + d - delta * vk, -1, 1), kk)
                return (lp - lm)[:, None, None] / (2 * delta) * vk

            gs = jax.vmap(probe)(v, jax.random.split(k_eval, half))
            return gs.mean(axis=0)

        def body(carry, k):
            d, opt_state, best_x, success = carry
            k_g, k_eval = jax.random.split(k)
            g = spsa_grad(d, k_g)
            updates, opt_state = opt.update(g, opt_state)
            d = jnp.clip(optax.apply_updates(d, updates), -eps, eps)
            d = jnp.clip(x + d, -1.0, 1.0) - x

            _, scores = loss_of(x + d, k_eval)
            pred = jnp.argmax(scores, -1)
            hit = (pred == y) if self.targeted else (pred != y)
            best_x = jnp.where(hit[:, None, None], x + d, best_x)
            success = jnp.logical_or(success, hit)
            return (d, opt_state, best_x, success), None

        d0 = jnp.zeros_like(x)
        carry0 = (d0, opt.init(d0), x + d0,
                  jnp.zeros(x.shape[0], dtype=bool))
        keys = jax.random.split(key, self.n_iters)
        (d, _, best_x, success), _ = jax.lax.scan(body, carry0, keys)
        x_adv = jnp.where(success[:, None, None], best_x, x + d)
        return x_adv, success

    __call__ = generate
