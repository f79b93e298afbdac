"""FAKEBOB black-box attack (IEEE S&P'21) with NES gradients.

TPU-native rebuild of ``robustness_eval/black_box_attack.py:13-311``:
NES gradient estimate + momentum + per-sample plateau-drop learning-rate
schedule + sign steps inside the eps-box, with per-sample early removal of
already-successful examples and periodic convergence-based early stopping.

The reference shrinks the live batch with Python list surgery
(``delete_found``, ``:135-178``); here every sample keeps its slot and a
boolean ``active`` mask freezes finished ones — fixed shapes, one compiled
``lax.while_loop`` that exits when all samples are done (SURVEY.md §7
"FAKEBOB's shrinking batches ... become masked lax.while_loop").

The per-sample plateau detector (``:105-111``) keeps the last
``plateau_length`` losses; list append/reset becomes a ring buffer + count.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.losses import resolve_loss
from audiopure_tpu.attacks.nes import NES


class FakebobState(NamedTuple):
    it: jnp.ndarray           # scalar iteration counter
    key: jax.Array
    adver_x: jnp.ndarray      # (B, 1, L)
    grad: jnp.ndarray         # (B, 1, L) momentum-filtered gradient
    best_adver_x: jnp.ndarray
    best_loss: jnp.ndarray    # (B,)
    success: jnp.ndarray      # (B,) bool
    active: jnp.ndarray       # (B,) bool — still being attacked
    lr: jnp.ndarray           # (B,)
    ring: jnp.ndarray         # (B, plateau_length) recent losses
    ring_n: jnp.ndarray       # (B,) valid entries in ring
    prev_loss: jnp.ndarray    # (B,) loss snapshot for convergence check


class FAKEBOB:
    """``FAKEBOB(model_fn, ...).generate(x, y, key)`` -> (x_adv, success).

    ``model_fn(x, key) -> logits``. Defaults mirror the reference
    constructor (``black_box_attack.py:15-44``) and the eval CLI's setting
    (``adaptive_attack_eval.py:152-160``: confidence 0.5, max_iter 200,
    samples_per_draw 200).
    """

    def __init__(
        self,
        model_fn: Callable,
        task: str = "SCR",
        targeted: bool = False,
        confidence: float = 0.5,
        epsilon: float = 0.002,
        max_iter: int = 200,
        max_lr: float = 1e-3,
        min_lr: float = 1e-6,
        samples_per_draw: int = 50,
        samples_per_draw_batch_size: int = 50,
        sigma: float = 1e-3,
        momentum: float = 0.9,
        plateau_length: int = 5,
        plateau_drop: float = 2.0,
        stop_early: bool = True,
        stop_early_iter: int = 100,
        eot_size: int = 1,
        eot_chunk: Optional[int] = None,
        threshold: Optional[float] = None,
        loss_mode: str = "margin",
    ):
        self.task = task
        self.targeted = targeted
        self.epsilon = float(epsilon)
        self.max_iter = int(max_iter)
        self.max_lr = float(max_lr)
        self.min_lr = float(min_lr)
        self.momentum = float(momentum)
        self.plateau_length = int(plateau_length)
        self.plateau_drop = float(plateau_drop)
        self.stop_early = stop_early
        self.stop_early_iter = int(stop_early_iter)
        self.threshold = threshold

        if task in ("SV", "OSI") and threshold is None:
            raise NotImplementedError(
                "threshold not specified for {} task; call "
                "estimate_threshold first".format(task))

        # loss_mode='margin' (default): the SEC4SR margin loss the
        # FAKEBOB paper specifies — negative margin => success, so
        # delete_found retirement and min-loss best-x bookkeeping work
        # as designed.  loss_mode='ce_ref' reproduces the reference's
        # ACTIVE resolve_loss dispatch for SCR (plain CE ascent,
        # ``_utils.py:117-126``), under which delete_found never fires
        # and best_adver_x stays at the first iterate — a reference bug
        # chain, kept for exact trajectory parity (docs/PARITY.md).
        assert loss_mode in ("margin", "ce_ref")
        self.loss_fn, self.grad_sign = resolve_loss(
            "Margin", targeted, confidence, task, threshold, clip_max=False,
            ref_active=(loss_mode == "ce_ref"))
        self.nes = NES(model_fn, self.loss_fn, samples_per_draw,
                       samples_per_draw_batch_size, sigma, eot_size,
                       eot_chunk)

    # ------------------------------------------------------------------
    def trajectory(self, x, y, key, n_iters: int):
        """Debug/golden-test entry: run the SAME per-iteration body as
        ``generate`` for exactly ``n_iters`` iterations as a scan,
        returning per-iteration ``(x_evaluated, lr, active, success,
        best_loss)`` stacks — lets parity tests diff full trajectories
        against the reference's ``attack_batch`` loop."""
        state, body, _ = self._setup(x, y, key)

        def step(s, _):
            s2 = body(s)
            return s2, (s.adver_x, s2.lr, s2.active, s2.success,
                        s2.best_loss)

        final, stacks = jax.lax.scan(step, state, None, length=n_iters)
        return final, stacks

    def _attack(self, x, y, key):
        state, body, cond = self._setup(x, y, key)
        final = jax.lax.while_loop(cond, body, state)
        return final.best_adver_x, final.success

    def _setup(self, x, y, key):
        B = x.shape[0]
        lower = jnp.clip(x - self.epsilon, min=-1.0)
        upper = jnp.clip(x + self.epsilon, max=1.0)

        state = FakebobState(
            it=jnp.asarray(0),
            key=key,
            adver_x=x,
            grad=jnp.zeros_like(x),
            best_adver_x=x,
            best_loss=jnp.full((B,), jnp.inf, dtype=x.dtype),
            success=jnp.zeros((B,), dtype=bool),
            active=jnp.ones((B,), dtype=bool),
            lr=jnp.full((B,), self.max_lr, dtype=x.dtype),
            ring=jnp.zeros((B, self.plateau_length), dtype=x.dtype),
            ring_n=jnp.zeros((B,), dtype=jnp.int32),
            prev_loss=jnp.full((B,), jnp.inf, dtype=x.dtype),
        )

        def cond(s: FakebobState):
            return jnp.logical_and(s.it <= self.max_iter, s.active.any())

        def body(s: FakebobState):
            key, sub = jax.random.split(s.key)
            res = self.nes(s.adver_x, y, sub)

            hit = (res.predict == y) if self.targeted else (res.predict != y)
            success = jnp.logical_or(s.success, jnp.logical_and(hit,
                                                                s.active))
            better = jnp.logical_and(res.adver_loss < s.best_loss, s.active)
            best_loss = jnp.where(better, res.adver_loss, s.best_loss)
            best_adver_x = jnp.where(better[:, None, None], s.adver_x,
                                     s.best_adver_x)

            # delete_found: margin loss < 0 <=> attack objective met
            active = jnp.logical_and(s.active, res.adver_loss >= 0)

            grad = self.momentum * s.grad + (1.0 - self.momentum) * res.grad

            # plateau LR schedule on the *mean* NES loss per sample
            ring = s.ring.at[jnp.arange(B),
                             s.ring_n % self.plateau_length].set(
                res.mean_loss)
            ring_n = s.ring_n + 1
            full = ring_n >= self.plateau_length
            newest = res.mean_loss
            oldest = ring[jnp.arange(B), ring_n % self.plateau_length]
            plateau = jnp.logical_and(full, newest > oldest)
            lr = jnp.where(plateau,
                           jnp.maximum(s.lr / self.plateau_drop,
                                       self.min_lr), s.lr)
            ring_n = jnp.where(plateau, 0, ring_n)

            step = (self.grad_sign * lr[:, None, None]
                    * jnp.sign(grad))
            new_x = jnp.clip(s.adver_x + step, lower, upper)
            adver_x = jnp.where(active[:, None, None], new_x, s.adver_x)

            # early-stop on convergence every stop_early_iter iterations —
            # INCLUDING iter 0 (ref ``:117``: ``iter % stop_early_iter ==
            # 0`` is true at 0, where prev_loss=inf just snapshots), so
            # the first real retirement chance is iter stop_early_iter,
            # not 2*stop_early_iter
            if self.stop_early:
                check = s.it % self.stop_early_iter == 0
                converged = (s.prev_loss * 0.9999 - res.mean_loss) < 0
                active = jnp.where(check,
                                   jnp.logical_and(active, ~converged),
                                   active)
                prev_loss = jnp.where(check, res.mean_loss, s.prev_loss)
            else:
                prev_loss = s.prev_loss

            return FakebobState(s.it + 1, key, adver_x, grad, best_adver_x,
                                best_loss, success, active, lr, ring,
                                ring_n, prev_loss)

        return state, body, cond

    # ------------------------------------------------------------------
    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
                 targeted: Optional[bool] = None):
        """(B, 1, L) in [-1, 1) -> (best adversarial x, success mask).
        Contract of the reference ``generate`` (``:186-219``)."""
        if targeted is not None and targeted != self.targeted:
            raise ValueError(
                "targetedness is baked into the compiled attack; construct "
                "FAKEBOB(targeted=...) accordingly")
        return self._attack(x, y, key)

    __call__ = generate

    # ------------------------------------------------------------------
    def estimate_threshold(self, x: jnp.ndarray, key: jax.Array,
                           decision_fn: Callable, step: float = 0.1,
                           max_outer: int = 20, max_inner: int = 200
                           ) -> Optional[float]:
        """Estimate the SV/OSI acceptance threshold by attacking rejected
        inputs until one is accepted (ref ``estimate_threshold_run:221-311``).

        ``decision_fn(x, key) -> (decision, score)`` where decision -1
        means "reject"; only inputs the system currently rejects are
        usable. Returns the mean estimated threshold, and stores it on
        ``self.threshold`` (ref ``estimate_threshold:296-311``).
        """
        import numpy as np

        if self.task == "CSI" or self.task == "SCR":
            print("--- Warning: no need to estimate threshold for CSI, "
                  "quitting ---")
            return None

        estimates = []
        for i in range(x.shape[0]):
            key, sub = jax.random.split(key)
            est = self._estimate_threshold_run(
                x[i: i + 1], sub, decision_fn, step, max_outer, max_inner)
            if est is not None:
                estimates.append(est)
        self.threshold = float(np.mean(estimates)) if estimates else None
        return self.threshold

    def _estimate_threshold_run(self, x, key, decision_fn, step,
                                max_outer, max_inner):
        import numpy as np

        from audiopure_tpu.attacks.losses import resolve_loss
        from audiopure_tpu.attacks.nes import NES

        key, k0 = jax.random.split(key)
        d, s = decision_fn(x, k0)
        if int(d[0]) != -1:
            return None  # already accepted: unusable for estimation
        init_score = float(np.max(np.asarray(s[0])))
        delta = abs(init_score * step)
        threshold = init_score + delta

        lower = jnp.clip(x - self.epsilon, min=-1.0)
        upper = jnp.clip(x + self.epsilon, max=1.0)
        adver_x = x
        y = jnp.asarray([-1])

        for _ in range(max_outer):
            loss_fn, grad_sign = resolve_loss(
                "Margin", False, 0.0, self.task, threshold, False)
            nes = NES(self.nes.eot.model_fn, loss_fn,
                      self.nes.samples_per_draw, self.nes.batch,
                      self.nes.sigma)
            grad = jnp.zeros_like(x)
            lr = self.max_lr
            for _ in range(max_inner):
                key, k1, k2 = jax.random.split(key, 3)
                d, s = decision_fn(adver_x, k1)
                score = float(np.max(np.asarray(s[0])))
                if int(d[0]) != -1:
                    return score       # accepted: threshold found
                if score >= threshold:
                    break              # exceeded candidate: raise it
                res = nes(adver_x, y, k2)
                grad = self.momentum * grad \
                    + (1 - self.momentum) * res.grad
                adver_x = jnp.clip(
                    adver_x + grad_sign * lr * jnp.sign(grad), lower, upper)
            threshold += delta
        return None
