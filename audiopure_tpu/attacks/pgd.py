"""White-box EOT-PGD attack (AudioAttack stage 1).

TPU-native rebuild of ``robustness_eval/white_box_attack.py:275-471``:
projected gradient ascent on the attack loss through the full
purify->transform->classify system, with per-iteration EOT for both the
prediction pass (``eot_defense_size``) and the gradient pass
(``eot_attack_size``), sign steps (linf) or normalized steps (l2),
eps-ball projection, [-1, 1] clamping, and latest-success bookkeeping.

The reference's Python loop with per-sample list surgery
(``stage_1:381-471``) becomes a single ``lax.scan`` over iterations with
masked updates — the whole attack is ONE compiled XLA program; gradients
flow through the purifier's reverse-diffusion scan by ``jax.grad``
(replacing torchsde's adjoint).

Stage 2 (Qin psychoacoustic imperceptibility, ``stage_2:474-608``) lives in
``attacks/imperceptible.py`` and is chained here when ``max_iter_2 > 0``,
matching ``generate`` (``:343-360``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.eot import EOT
from audiopure_tpu.attacks.losses import cross_entropy
from audiopure_tpu.utils.jit_utils import hoisted_jit


def lp_norm(x: jnp.ndarray, p: str) -> jnp.ndarray:
    """Reference ``lp_norm`` (``white_box_attack.py:22-34``)."""
    if p == "linf":
        return jnp.max(jnp.abs(x))
    if p == "l2":
        if x.ndim == 3:
            return jnp.sqrt(jnp.sum(x ** 2, axis=(1, 2)))[:, None, None]
        return jnp.sqrt(jnp.sum(x ** 2, axis=1))
    raise NotImplementedError(f"Unsupported norm: {p}!")


def project_to_norm_ball(x: jnp.ndarray, p: str, eps) -> jnp.ndarray:
    """Reference ``project_to_norm_ball`` (``white_box_attack.py:9-20``),
    batched: ``eps`` may be scalar or per-sample (B,)."""
    if p == "linf":
        if jnp.ndim(eps) > 0:
            eps = eps.reshape(-1, *([1] * (x.ndim - 1)))
        return jnp.clip(x, -eps, eps)
    if p == "l2":
        norm = jnp.sqrt(jnp.sum(x ** 2, axis=tuple(range(1, x.ndim)),
                                keepdims=True))
        if jnp.ndim(eps) > 0:
            eps = eps.reshape(-1, *([1] * (x.ndim - 1)))
        factor = jnp.minimum(1.0, eps / jnp.maximum(norm, 1e-12))
        return x * factor
    raise NotImplementedError(f"Unsupported norm: {p}!")


class AudioAttack:
    """EOT-PGD on a stochastic system ``model_fn(x, key) -> logits``.

    Args mirror the reference constructor (``white_box_attack.py:280-302``);
    the eval CLI passes ``learning_rate_1 = eps/5`` for linf and ``eps/2``
    for l2 (``adaptive_attack_eval.py:146``).
    """

    def __init__(
        self,
        model_fn: Callable,
        loss_fn: Callable = cross_entropy,
        eps: float = 0.002,
        norm: str = "linf",
        learning_rate_1: Optional[float] = None,
        max_iter_1: int = 70,
        max_iter_2: int = 0,
        eot_attack_size: int = 1,
        eot_defense_size: int = 1,
        eot_chunk: Optional[int] = None,
        clip_min: float = -1.0,
        clip_max: float = 1.0,
        masker=None,
        stage2_kwargs: Optional[dict] = None,
        predict_model_fn: Optional[Callable] = None,
        share_eot: bool = False,
        pair_fused: bool = False,
        segment_iters: int = 0,
    ):
        self.model_fn = model_fn
        self.loss_fn = loss_fn
        self.eps = float(eps)
        self.norm = norm
        if learning_rate_1 is None:
            learning_rate_1 = eps / 5 if norm == "linf" else eps / 2
        self.lr = float(learning_rate_1)
        self.max_iter_1 = int(max_iter_1)
        self.max_iter_2 = int(max_iter_2)
        self.clip_min = clip_min
        self.clip_max = clip_max
        self.masker = masker
        self.stage2_kwargs = stage2_kwargs or {}

        self.eot_attack = EOT(model_fn, loss_fn, eot_attack_size,
                              chunk=eot_chunk, use_grad=True)
        # the prediction pass never differentiates, so callers may supply
        # a value-identical but faster forward (e.g. the forward-only
        # fused kernel when model_fn uses the custom-VJP grad path);
        # the reference uses one module for both passes — values match
        self.eot_defense = EOT(predict_model_fn or model_fn, loss_fn,
                               eot_defense_size, chunk=eot_chunk,
                               use_grad=False)
        # share_eot: reuse the attack pass's forward scores for the
        # prediction bookkeeping instead of running a second independent
        # EOT stack — the reference evaluates prediction and gradient at
        # the SAME point x+delta with two independent replica sets
        # (``stage_1:386-435``); sharing keeps the estimator (mean score
        # over eot_size fresh purification draws at that point) and the
        # update rule, halving the purifications per iteration.  Off by
        # default (exact reference pairing); requires equal EOT sizes so
        # the prediction estimator's replica count is unchanged.
        # Deviation documented in docs/PARITY.md.
        self.share_eot = bool(share_eot)
        if self.share_eot and eot_attack_size != eot_defense_size:
            raise ValueError(
                "share_eot requires eot_attack_size == eot_defense_size "
                f"(got {eot_attack_size} vs {eot_defense_size})")
        # pair_fused: EXACT reference pairing (two independent EOT
        # stacks per iteration) scheduled as one 2R-replica dispatch
        # (``EOT.paired``) — estimator-identical to the default two-pass
        # body given the same keys (test-pinned), different compute
        # schedule only. Orthogonal to share_eot (which halves the
        # purifications and is the documented deviation).
        self.pair_fused = bool(pair_fused)
        if self.pair_fused:
            if self.share_eot:
                raise ValueError("pair_fused is the exact-pairing "
                                 "schedule; share_eot already removes "
                                 "the second stack")
            if eot_attack_size != eot_defense_size:
                raise ValueError(
                    "pair_fused requires eot_attack_size == "
                    f"eot_defense_size (got {eot_attack_size} vs "
                    f"{eot_defense_size})")
        # segment_iters > 0: run stage 1 as ceil(max_iter_1/segment_iters)
        # compiled segments with the (delta, x_adv, success) carry passed
        # between dispatches. Trajectory-identical to the monolithic
        # program (same scan body, same precomputed per-iteration keys;
        # test-pinned). Motivation: the remote TPU execution runtime
        # kills single dispatches running over ~60 s ("TPU worker
        # crashed"), which the reference 70-iteration EOT-15x15 attack
        # exceeds ~3x; segments also give per-segment progress.
        self.segment_iters = int(segment_iters)
        self._stage1_cache = {}

    # ------------------------------------------------------------------
    def _predict(self, x, y, key):
        scores, _, _, _ = self.eot_defense(x, y, key, use_grad=False)
        return jnp.argmax(scores, axis=-1)

    def _stage_1(self, x, y, key, targeted: bool):
        """Whole stage-1 attack as ONE compiled program, with the model's
        parameter trees hoisted to runtime arguments (``hoisted_jit``) —
        without hoisting, the closed-over UNet/classifier weights inline
        into the program as hundreds of MB of literals.

        With ``segment_iters`` set, the iteration scan is split into
        several dispatches of that length with the carry passed between
        them — same body, same precomputed keys, bit-identical
        trajectory (tested) — so no single dispatch exceeds the remote
        runtime's execution watchdog."""
        seg = self.segment_iters
        if seg <= 0 or seg >= self.max_iter_1:
            jitted = self._stage1_cache.get(("mono", targeted))
            if jitted is None:
                jitted = hoisted_jit(functools.partial(
                    self._stage_1_impl, targeted=targeted))
                self._stage1_cache[("mono", targeted)] = jitted
            return jitted(x, y, key)

        # the SAME key split as the monolithic program (inside vs outside
        # jit is value-identical), sliced per segment
        keys = jax.random.split(key, self.max_iter_1 + 1)
        seg_fn = self._stage1_cache.get(("seg", targeted))
        if seg_fn is None:
            seg_fn = hoisted_jit(functools.partial(
                self._segment_impl, targeted=targeted))
            self._stage1_cache[("seg", targeted)] = seg_fn
        tail_fn = self._stage1_cache.get(("tail", targeted))
        if tail_fn is None:
            tail_fn = hoisted_jit(functools.partial(
                self._tail_impl, targeted=targeted))
            self._stage1_cache[("tail", targeted)] = tail_fn

        delta = jnp.zeros_like(x)
        x_adv = x
        success = jnp.zeros(x.shape[0], dtype=bool)
        pos = 0
        while pos < self.max_iter_1:
            n = min(seg, self.max_iter_1 - pos)
            delta, x_adv, success = seg_fn(
                x, y, keys[pos: pos + n], delta, x_adv, success)
            pos += n
        return tail_fn(x, y, keys[-1], delta, x_adv, success)

    def _make_body(self, x, y, targeted: bool):
        """The per-iteration scan body (one prediction stack + one
        gradient stack + the delta update), shared by the monolithic and
        segmented stage-1 programs."""
        sign = -1.0 if targeted else 1.0

        def hit_mask(pred):
            return (pred == y) if targeted else (pred != y)

        def body(carry, key_i):
            delta, x_adv, success = carry
            k_def, k_atk = jax.random.split(key_i)
            x_pert = x + delta

            if self.share_eot:
                # one EOT stack: its mean scores serve the prediction
                # bookkeeping AND its mean grad serves the update —
                # both evaluated at x_pert, as in the reference
                scores, _, grad, _ = self.eot_attack(
                    x_pert, y, k_atk, use_grad=True)
                pred = jnp.argmax(scores, axis=-1)
            elif self.pair_fused:
                # exact pairing, one fused 2R-replica dispatch
                scores, grad = self.eot_attack.paired(
                    x_pert, y, k_def, k_atk)
                pred = jnp.argmax(scores, axis=-1)
            else:
                pred = self._predict(x_pert, y, k_def)
            hit = hit_mask(pred)
            x_adv = jnp.where(hit[:, None, None], x_pert, x_adv)
            success = jnp.logical_or(success, hit)

            if not (self.share_eot or self.pair_fused):
                _, _, grad, _ = self.eot_attack(x_pert, y, k_atk,
                                                use_grad=True)
            if self.norm == "linf":
                step = self.lr * jnp.sign(grad)
            else:
                step = self.lr * grad / jnp.maximum(
                    lp_norm(grad, "l2"), 1e-12)
            delta = delta + sign * step
            delta = project_to_norm_ball(delta, self.norm, self.eps)
            delta = jnp.clip(x + delta, self.clip_min, self.clip_max) - x
            return (delta, x_adv, success), None

        return body, hit_mask

    def _stage_1_impl(self, x, y, key, targeted: bool):
        body, hit_mask = self._make_body(x, y, targeted)
        delta0 = jnp.zeros_like(x)
        carry0 = (delta0, x, jnp.zeros(x.shape[0], dtype=bool))
        keys = jax.random.split(key, self.max_iter_1 + 1)
        (delta, x_adv, success), _ = jax.lax.scan(
            body, carry0, keys[:-1])
        return self._tail_impl(x, y, keys[-1], delta, x_adv, success,
                               targeted=targeted)

    def _segment_impl(self, x, y, keys_seg, delta, x_adv, success,
                      targeted: bool):
        body, _ = self._make_body(x, y, targeted)
        carry, _ = jax.lax.scan(body, (delta, x_adv, success), keys_seg)
        return carry

    def _tail_impl(self, x, y, key_last, delta, x_adv, success,
                   targeted: bool):
        _, hit_mask = self._make_body(x, y, targeted)
        # trailing prediction pass (iteration i == max_iter_1, ref ``:426``)
        x_pert = x + delta
        pred = self._predict(x_pert, y, key_last)
        hit = hit_mask(pred)
        x_adv = jnp.where(hit[:, None, None], x_pert, x_adv)
        success = jnp.logical_or(success, hit)

        # unsuccessful samples return the final perturbed x (ref ``:460-467``)
        x_adv = jnp.where(success[:, None, None], x_adv, x_pert)
        return x_adv, success

    # ------------------------------------------------------------------
    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
                 targeted: bool = False):
        """Returns (x_adv, (success_stage_1, success_stage_2 | None)) —
        the reference ``generate`` contract (``:343-360``)."""
        k1, k2 = jax.random.split(key)
        x_adv, success1 = self._stage_1(x, y, k1, targeted)
        if self.max_iter_2 > 0:
            from audiopure_tpu.attacks.imperceptible import stage_2
            x_adv, success2 = stage_2(
                self.model_fn, self.loss_fn, self.masker, x, x_adv, y, k2,
                targeted=targeted, max_iter=self.max_iter_2,
                clip_min=self.clip_min, clip_max=self.clip_max,
                **self.stage2_kwargs)
            return x_adv, (success1, success2)
        return x_adv, (success1, None)

    __call__ = generate
