"""Classifier training: standard, mixup, and adversarial.

Rebuild of the reference trainers
(``audio_models/ConvNets_SpeechCommands/train_speech_commands.py:60-254``,
``adv_train_speech_commands.py:139-246``, ``mixup.py:17-52``,
``audio_models/M5/train.py``, ``audio_models/RCNN_KWS/train.py:84-121``):

* one jitted train step covering CE loss, BatchNorm batch_stats updates,
  dropout RNG, optional mixup, and optional in-step waveform PGD
  (adversarial training) — the reference's inner PGD Python loop
  (``adv_train_speech_commands.py:139-183``) is a ``lax.scan`` inside the
  same compiled program;
* host-side LR controllers: step decay and reduce-on-plateau, matching the
  reference's two ``lr_scheduler`` options.

Works with both raw-logit classifiers (ConvNet zoo) and log-softmax
classifiers (M5/KWS): cross-entropy on already-normalized log-probs equals
NLL, so one loss covers both.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiopure_tpu.attacks.losses import cross_entropy


class ClassifierState(NamedTuple):
    step: jnp.ndarray
    variables: Any          # {'params':..., 'batch_stats':... (optional)}
    opt_state: Any
    key: jax.Array


def _split_vars(variables):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    mixup_alpha: float = 0.0,
    adv_config: Optional[dict] = None,
    transform: Optional[Callable] = None,
):
    """Returns ``train_step(state, x, y) -> (state, metrics)``.

    apply_fn: flax ``model.apply`` (mutable batch_stats handled here).
    transform: optional wave->spec front-end applied inside the step (so
    adversarial perturbations live in the waveform domain, like the
    reference's adversarial trainer).
    adv_config: {'eps', 'alpha', 'steps', 'norm', 'ratio'} for in-step PGD
    (ref ``adv_train_speech_commands.py:139-183``; ratio = fraction of the
    batch attacked, ``adv_ratio``).
    """

    def forward(params, rest, x, y, train, drop_key):
        inp = transform(x) if transform is not None else x
        kwargs = dict(train=train) if train else {}
        rngs = {"dropout": drop_key} if train else None
        if "batch_stats" in rest and train:
            out, updates = apply_fn({"params": params, **rest}, inp,
                                    mutable=["batch_stats"], rngs=rngs,
                                    **kwargs)
            return out, updates
        out = apply_fn({"params": params, **rest}, inp, rngs=rngs, **kwargs)
        return out, {}

    def pgd_perturb(params, rest, x, y, key):
        cfg = adv_config
        eps, alpha, steps = cfg["eps"], cfg["alpha"], cfg["steps"]
        norm = cfg.get("norm", "linf")

        def loss_wrt_x(xp):
            logits, _ = forward(params, rest, xp, y, False, key)
            return cross_entropy(logits, y).sum()

        def body(delta, _):
            g = jax.grad(loss_wrt_x)(x + delta)
            if norm == "linf":
                delta = delta + alpha * jnp.sign(g)
                delta = jnp.clip(delta, -eps, eps)
            else:
                gn = jnp.sqrt(jnp.sum(g ** 2, axis=tuple(
                    range(1, g.ndim)), keepdims=True))
                delta = delta + alpha * g / jnp.maximum(gn, 1e-12)
                dn = jnp.sqrt(jnp.sum(delta ** 2, axis=tuple(
                    range(1, delta.ndim)), keepdims=True))
                delta = delta * jnp.minimum(1.0, eps / jnp.maximum(
                    dn, 1e-12))
            delta = jnp.clip(x + delta, -1.0, 1.0) - x
            return delta, None

        delta0 = jnp.zeros_like(x)
        delta, _ = jax.lax.scan(body, delta0, None, length=steps)
        return x + delta

    @jax.jit
    def train_step(state: ClassifierState, x: jnp.ndarray, y: jnp.ndarray):
        key, k_drop, k_mix, k_adv = jax.random.split(state.key, 4)
        params, rest = _split_vars(state.variables)

        if adv_config is not None:
            x_adv = pgd_perturb(params, rest, x, y, k_adv)
            ratio = adv_config.get("ratio", 1.0)
            n_adv = int(round(x.shape[0] * ratio))
            x = jnp.concatenate([x_adv[:n_adv], x[n_adv:]], axis=0)

        if mixup_alpha > 0:
            lam = jax.random.beta(k_mix, mixup_alpha, mixup_alpha)
            perm = jax.random.permutation(k_mix, x.shape[0])
            x_mix = lam * x + (1 - lam) * x[perm]
            y_b = y[perm]
        else:
            lam, x_mix, y_b = 1.0, x, y

        def loss_fn(p):
            logits, updates = forward(p, rest, x_mix, y, True, k_drop)
            loss = lam * cross_entropy(logits, y).mean() \
                + (1 - lam) * cross_entropy(logits, y_b).mean()
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        opt_updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  params)
        params = optax.apply_updates(params, opt_updates)
        variables = {"params": params, **rest, **updates}
        acc = (jnp.argmax(logits, -1) == y).mean()
        return (ClassifierState(state.step + 1, variables, opt_state, key),
                {"loss": loss, "acc": acc})

    return train_step


def make_eval_step(apply_fn: Callable,
                   transform: Optional[Callable] = None):
    @jax.jit
    def eval_step(variables, x, y):
        inp = transform(x) if transform is not None else x
        logits = apply_fn(variables, inp)
        loss = cross_entropy(logits, y).mean()
        pred = jnp.argmax(logits, -1)
        return {"loss": loss, "correct": (pred == y).sum(),
                "pred": pred}

    return eval_step


def init_classifier_state(variables, optimizer, key) -> ClassifierState:
    return ClassifierState(jnp.asarray(0), variables,
                           optimizer.init(variables["params"]), key)


# ---------------------------------------------------------------------------
# host-side LR controllers (the reference's lr_scheduler options)
# ---------------------------------------------------------------------------

class ReduceLROnPlateau:
    """ref ``train_speech_commands.py`` 'plateau' scheduler semantics."""

    def __init__(self, init_lr: float, patience: int = 5,
                 factor: float = 0.5, min_lr: float = 1e-6):
        self.lr = init_lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = np.inf
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-8:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class StepLR:
    def __init__(self, init_lr: float, step_size: int = 50,
                 gamma: float = 0.1):
        self.init_lr = init_lr
        self.step_size = step_size
        self.gamma = gamma

    def at_epoch(self, epoch: int) -> float:
        return self.init_lr * self.gamma ** (epoch // self.step_size)


def make_optimizer(name: str = "sgd", lr: float = 1e-2,
                   momentum: float = 0.9, weight_decay: float = 1e-2,
                   lr_schedule: Optional[Callable] = None):
    """SGD+momentum+wd or Adam, optionally with an injectable LR schedule
    (host-controlled via ``optax.inject_hyperparams``)."""
    if name == "sgd":
        base = lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum))
    else:
        base = lambda learning_rate: optax.adam(learning_rate)
    if lr_schedule is not None:
        return base(lr_schedule)
    return optax.inject_hyperparams(
        lambda learning_rate: base(learning_rate))(learning_rate=lr)


def set_lr(opt_state, lr: float):
    """Update the LR of an inject_hyperparams optimizer state in place."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state
