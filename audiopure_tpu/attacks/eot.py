"""Expectation-over-Transformation as a vmapped replica axis.

TPU-native rebuild of ``robustness_eval/_EOT.py:5-69``: the reference
repeats the batch ``EOT_size`` times and loops over chunks, averaging
scores/loss/grad and collecting per-replica decisions. Here the replica
axis is a ``vmap`` over PRNG keys — one compiled program, MXU-batched,
with fresh purification noise per replica (the property EOT correctness
depends on; SURVEY.md §7).

``chunks``: when memory is tight, replicas are processed in
``EOT_size // chunk`` scanned groups of vmapped size ``chunk`` — the JAX
analogue of the reference's ``EOT_batch_size`` chunking.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


class EOT:
    """Wraps a stochastic model ``model_fn(x, key) -> logits``.

    __call__(x, y, key) returns (mean_scores, mean per-sample loss,
    mean grad wrt x or None, decisions (R, B)).
    """

    def __init__(
        self,
        model_fn: Callable,
        loss_fn: Callable,
        eot_size: int = 1,
        chunk: Optional[int] = None,
        use_grad: bool = True,
    ):
        self.model_fn = model_fn
        self.loss_fn = loss_fn
        self.eot_size = int(eot_size)
        self.chunk = int(chunk) if chunk else self.eot_size
        assert self.eot_size % self.chunk == 0
        self.use_grad = use_grad

    def _replica_loss(self, x, y, key):
        scores = self.model_fn(x, key)
        loss = self.loss_fn(scores, y)       # (B,)
        return loss.sum(), (scores, loss)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
                 use_grad: Optional[bool] = None):
        use_grad = self.use_grad if use_grad is None else use_grad
        keys = jax.random.split(key, self.eot_size)

        if use_grad:
            def one(k):
                (_, (scores, loss)), g = jax.value_and_grad(
                    self._replica_loss, has_aux=True)(x, y, k)
                return scores, loss, g
        else:
            def one(k):
                _, (scores, loss) = self._replica_loss(x, y, k)
                return scores, loss, jnp.zeros((), dtype=x.dtype)

        n_chunks = self.eot_size // self.chunk
        if n_chunks == 1:
            scores, losses, grads = jax.vmap(one)(keys)
        else:
            def chunk_body(_, ks):
                return None, jax.vmap(one)(ks)
            _, (scores, losses, grads) = jax.lax.scan(
                chunk_body, None, keys.reshape(n_chunks, self.chunk, -1))
            scores = scores.reshape(self.eot_size, *scores.shape[2:])
            losses = losses.reshape(self.eot_size, *losses.shape[2:])
            if use_grad:
                grads = grads.reshape(self.eot_size, *grads.shape[2:])

        mean_scores = scores.mean(axis=0)          # (B, C)
        mean_loss = losses.mean(axis=0)            # (B,)
        mean_grad = grads.mean(axis=0) if use_grad else None
        decisions = jnp.argmax(scores, axis=-1)    # (R, B)
        return mean_scores, mean_loss, mean_grad, decisions

    def paired(self, x: jnp.ndarray, y: jnp.ndarray, key_def: jax.Array,
               key_atk: jax.Array):
        """Both reference EOT stacks of one PGD iteration — the
        independent prediction stack and the independent gradient stack
        (``white_box_attack.py:386-435``) — as ONE ``2R``-replica vmap.

        Estimator-identical to calling the defense stack and the attack
        stack separately with the same keys (test-pinned): per-replica
        loss weights are 0 for the R defense replicas and 1 for the R
        attack replicas, so the defense half contributes exact zeros to
        the summed gradient while its scores feed the prediction mean.
        One dispatch schedules the expensive purify forwards at 2R
        replicas; the price is that the (cheap, stop-grad-eps-net)
        backward also runs over the defense half with zero cotangents.
        Returns ``(mean_scores_def, mean_grad_atk)``.
        """
        R = self.eot_size
        keys = jnp.concatenate([jax.random.split(key_def, R),
                                jax.random.split(key_atk, R)])
        w = jnp.concatenate([jnp.zeros((R,)), jnp.ones((R,))])

        def one(k, wi):
            def weighted(xx):
                scores = self.model_fn(xx, k)
                return (wi * self.loss_fn(scores, y)).sum(), scores
            (_, scores), g = jax.value_and_grad(
                weighted, has_aux=True)(x)
            return scores, g

        scores, grads = jax.vmap(one)(keys, w)
        mean_scores_def = scores[:R].mean(axis=0)
        mean_grad_atk = grads.sum(axis=0) / R   # defense half: exact 0
        return mean_scores_def, mean_grad_atk
