"""SirenAttack: PSO (particle swarm) black-box attack.

Working TPU-native rebuild of the reference's *commented-out*
SirenAttack (``robustness_eval/black_box_attack.py:315-582``), matching
its algorithm:

* distortion bounds ``lower = clamp(-1-x, -eps)``,
  ``upper = clamp(1-x, eps)`` (ref ``:556-558``), velocity bounds
  ``±|upper - lower|``;
* outer *epochs* re-seed the swarm keeping only the best particle
  (ref ``:373-387``); inner *iters* run classic PSO with inertia
  ``w`` annealed ``w_init -> w_end`` and cognitive/social constants
  ``c1/c2`` (ref ``:476-487``);
* fitness = the SEC4SR Margin loss; success when the best fitness goes
  negative (ref ``:497-500``);
* early abort when the mean global best stops improving by 1e-4
  relative over ``abort_early_iter`` iters / ``abort_early_epoch``
  epochs (ref ``:450-457,489-494``).

TPU redesign: the reference shrinks the live batch by re-concatenating
tensors every time an example succeeds (``delete_found``, ``:503-545``)
— dynamic shapes that would force a recompile per batch composition.
Here finished examples are *frozen with masks* inside fixed-shape
``lax.scan`` loops, and all ``B x n_particles`` candidates ride the
model's batch dimension in one forward per PSO step, so the whole
attack is a single compiled program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.losses import resolve_loss


class SirenAttack:
    """``SirenAttack(model_fn, ...).generate(x, y, key)`` ->
    ``(x_adv, success)``; ``model_fn(x, key) -> logits``.

    Defaults mirror the reference constructor
    (``black_box_attack.py:317-321``)."""

    def __init__(
        self,
        model_fn: Callable,
        task: str = "SCR",
        targeted: bool = False,
        confidence: float = 0.0,
        epsilon: float = 0.002,
        max_epoch: int = 300,
        max_iter: int = 30,
        c1: float = 1.4961,
        c2: float = 1.4961,
        n_particles: int = 25,
        w_init: float = 0.9,
        w_end: float = 0.1,
        abort_early: bool = True,
        abort_early_iter: int = 10,
        abort_early_epoch: int = 10,
        threshold: Optional[float] = None,
    ):
        self.model_fn = model_fn
        self.targeted = targeted
        self.epsilon = float(epsilon)
        self.max_epoch = int(max_epoch)
        self.max_iter = int(max_iter)
        self.c1, self.c2 = float(c1), float(c2)
        self.n_particles = int(n_particles)
        self.w_init, self.w_end = float(w_init), float(w_end)
        self.abort_early = bool(abort_early)
        self.abort_early_iter = int(abort_early_iter)
        self.abort_early_epoch = int(abort_early_epoch)
        self.loss_fn, _ = resolve_loss("Margin", targeted, confidence,
                                       task, threshold, False)

    def _fitness(self, x, y, locations, key):
        """One batched forward over all B*P candidates -> (B, P) loss."""
        B, P = locations.shape[:2]
        cand = (x[:, None] + locations).reshape((B * P,) + x.shape[1:])
        logits = self.model_fn(cand, key)
        yy = jnp.repeat(y, P)
        return self.loss_fn(logits, yy).reshape(B, P)

    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array):
        B = x.shape[0]
        P = self.n_particles
        eps = self.epsilon
        lower = jnp.clip(-1.0 - x, min=-eps)   # ref :556-558
        upper = jnp.clip(1.0 - x, max=eps)
        shape_p = (B, P) + x.shape[1:]

        def uniform(k, shape, lo, hi):
            return lo + (hi - lo) * jax.random.uniform(k, shape,
                                                       dtype=x.dtype)

        def pso_iter(carry, inp):
            (loc, vel, pbests, pbest_loc, gbest, gbest_loc, prev_gbest,
             live) = carry
            it, k = inp
            k_eval, k_r1, k_r2 = jax.random.split(k, 3)

            loss = self._fitness(x, y, loc, k_eval)          # (B, P)
            better = loss < pbests
            pbests = jnp.where(better, loss, pbests)
            pbest_loc = jnp.where(better[(...,) + (None,) * (loc.ndim - 2)],
                                  loc, pbest_loc)

            best_p = jnp.min(pbests, axis=1)                 # (B,)
            best_i = jnp.argmin(pbests, axis=1)
            improved = best_p < gbest
            gbest = jnp.where(improved, best_p, gbest)
            new_gloc = jnp.take_along_axis(
                pbest_loc, best_i[(slice(None), None) +
                                  (None,) * (loc.ndim - 2)], axis=1)[:, 0]
            gbest_loc = jnp.where(improved[(...,) + (None,) *
                                           (gbest_loc.ndim - 1)],
                                  new_gloc, gbest_loc)

            # inner early abort: mean gbest stopped improving
            check = self.abort_early & (
                (it + 1) % self.abort_early_iter == 0)
            converged = jnp.mean(gbest) > 0.9999 * jnp.mean(prev_gbest)
            live = live & ~(check & converged)
            prev_gbest = jnp.where(check, gbest, prev_gbest)

            # velocity/position update (annealed inertia, ref :476-487)
            w = ((self.w_init - self.w_end)
                 * (self.max_iter - it - 1) / self.max_iter + self.w_end)
            r1 = jax.random.uniform(k_r1, shape_p, dtype=x.dtype) + 1e-5
            r2 = jax.random.uniform(k_r2, shape_p, dtype=x.dtype) + 1e-5
            vel = (w * vel + self.c1 * r1 * (pbest_loc - loc)
                   + self.c2 * r2 * (gbest_loc[:, None] - loc))
            # frozen examples (already adversarial: gbest < 0) and a
            # converged swarm stop moving — masked, not re-batched
            frozen = (gbest < 0)[(...,) + (None,) * (loc.ndim - 1)] | ~live
            new_loc = jnp.clip(loc + vel, lower[:, None], upper[:, None])
            loc = jnp.where(frozen, loc, new_loc)
            return (loc, vel, pbests, pbest_loc, gbest, gbest_loc,
                    prev_gbest, live), None

        def epoch_body(carry, inp):
            gbest, gbest_loc, prev_gbest_ep, live_ep = carry
            ep, k = inp
            k_seed, k_vel, k_scan = jax.random.split(k, 3)

            # re-seed swarm; slot 0 keeps the global best so far
            # (ref :373-387 keeps the best particle across epochs)
            loc = uniform(k_seed, shape_p, lower[:, None], upper[:, None])
            loc = loc.at[:, 0].set(
                jnp.where(ep > 0, gbest_loc, loc[:, 0]))
            pbests = jnp.full((B, P), jnp.inf, dtype=x.dtype)
            pbests = pbests.at[:, 0].set(jnp.where(
                ep > 0, gbest, pbests[:, 0]))
            v_up = jnp.abs(lower - upper)
            vel = uniform(k_vel, shape_p, -v_up[:, None], v_up[:, None])

            keys = jax.random.split(k_scan, self.max_iter + 1)
            its = jnp.arange(self.max_iter + 1)
            (_, _, _, _, gbest, gbest_loc, _, _), _ = jax.lax.scan(
                pso_iter,
                (loc, vel, pbests, loc, gbest, gbest_loc, gbest,
                 live_ep & jnp.ones((), bool)),
                (its, keys))

            check = self.abort_early & (
                (ep + 1) % self.abort_early_epoch == 0)
            converged = jnp.mean(gbest) > 0.9999 * jnp.mean(prev_gbest_ep)
            live_ep = live_ep & ~(check & converged)
            prev_gbest_ep = jnp.where(check, gbest, prev_gbest_ep)
            return (gbest, gbest_loc, prev_gbest_ep, live_ep), None

        gbest0 = jnp.full((B,), jnp.inf, dtype=x.dtype)
        keys = jax.random.split(key, self.max_epoch)
        (gbest, gbest_loc, _, _), _ = jax.lax.scan(
            epoch_body,
            (gbest0, jnp.zeros_like(x), gbest0, jnp.ones((), bool)),
            (jnp.arange(self.max_epoch), keys))

        success = gbest < 0
        return x + gbest_loc, success
