"""NES gradient estimator (antithetic sampling).

TPU-native rebuild of ``robustness_eval/_NES.py:6-56``: estimates
``grad ~= E[loss(x + sigma*u) * u] / sigma`` with antithetic +-u pairs; the
first draw also evaluates the clean point to report per-sample adversarial
loss / scores / majority-vote prediction.

The reference's Python loop over draw-batches with tensor surgery becomes a
``lax.scan`` over draw groups with a vmapped replica axis — the full
estimator is one compiled program. (The reference divides loss/scores by
``EOT_num_batches`` a second time after the EOT wrapper already averaged,
``_NES.py:36-37``; a no-op at the default EOT=1 and a double-division quirk
otherwise — not reproduced, since sign-based consumers are scale-invariant.)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.eot import EOT
from audiopure_tpu.attacks.losses import majority_vote


class NESResult(NamedTuple):
    mean_loss: jnp.ndarray    # (B,)
    grad: jnp.ndarray         # (B, 1, L)
    adver_loss: jnp.ndarray   # (B,) loss at the clean point
    adver_score: jnp.ndarray  # (B, C) scores at the clean point
    predict: jnp.ndarray      # (B,) majority-vote prediction at clean point


class NES:
    """``NES(model_fn, loss_fn, ...)(x, y, key) -> NESResult``.

    ``model_fn(x, key) -> logits`` may be stochastic (purifier inside);
    ``eot_size``/``eot_chunk`` add the EOT replica axis of the reference's
    ``EOT_wrapper`` (``_NES.py:13,34``).
    """

    def __init__(
        self,
        model_fn: Callable,
        loss_fn: Callable,
        samples_per_draw: int = 50,
        samples_per_draw_batch: int = 50,
        sigma: float = 1e-3,
        eot_size: int = 1,
        eot_chunk: Optional[int] = None,
    ):
        assert samples_per_draw % samples_per_draw_batch == 0
        assert samples_per_draw_batch % 2 == 0
        self.samples_per_draw = int(samples_per_draw)
        self.batch = int(samples_per_draw_batch)
        self.sigma = float(sigma)
        self.eot = EOT(model_fn, loss_fn, eot_size, chunk=eot_chunk,
                       use_grad=False)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray,
                 key: jax.Array) -> NESResult:
        B = x.shape[0]
        half = self.batch // 2
        num_batches = self.samples_per_draw // self.batch

        def eval_points(points, keys_):
            """points: (S, B, 1, L) -> per-sample losses (S, B)."""
            def one(pt, k):
                _, loss, _, _ = self.eot(pt, y, k, use_grad=False)
                return loss
            return jax.vmap(one)(points, keys_)

        def draw(carry, key_i):
            grad_acc, loss_acc = carry
            k_noise, k_eval = jax.random.split(key_i)
            u = jax.random.normal(k_noise, (half, *x.shape), dtype=x.dtype)
            noise = jnp.concatenate([u, -u], axis=0)       # (batch, B, 1, L)
            points = x[None] + self.sigma * noise
            losses = eval_points(points,
                                 jax.random.split(k_eval, self.batch))
            # grad contribution: mean over draws of loss * noise
            g = jnp.mean(losses[:, :, None, None] * noise, axis=0)
            return (grad_acc + g, loss_acc + losses.mean(axis=0)), None

        keys = jax.random.split(key, num_batches + 1)
        (grad, mean_loss), _ = jax.lax.scan(
            draw, (jnp.zeros_like(x), jnp.zeros(B, dtype=x.dtype)),
            keys[:-1])
        grad = grad / self.sigma / num_batches
        mean_loss = mean_loss / num_batches

        # clean point: adversarial loss/scores + majority-vote prediction
        scores, adver_loss, _, decisions = self.eot(
            x, y, keys[-1], use_grad=False)
        predict = majority_vote(decisions, scores.shape[-1])
        return NESResult(mean_loss, grad, adver_loss, scores, predict)
