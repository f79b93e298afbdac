"""DiffWave training step: eps-prediction MSE, sharded over a TPU mesh.

TPU-native rebuild of the reference trainer's hot loop
(``DiffWave_Unconditional/train.py:105-138`` + ``util.py:161-185``):
uniform-random timestep, q-sample, MSE between predicted and true noise,
Adam at lr 2e-4 (``configs/config.json:25``).

The reference's multi-GPU machinery — per-param backward hooks that bucket,
all-reduce and re-scatter grads over NCCL (``distributed_util.py:97-149``) —
does not exist here: the train step is jitted over a (dp, tp) mesh with the
batch sharded on dp and weights on tp; the gradient all-reduce is a
compiler-emitted psum over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from audiopure_tpu.diffusion.schedule import DiffusionSchedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jax.Array


def diffusion_training_loss(apply_fn: Callable, params, x0: jnp.ndarray,
                            key: jax.Array,
                            schedule: DiffusionSchedule) -> jnp.ndarray:
    """MSE(eps_theta(x_t, t), z) at uniform random t (ref ``util.py:161-185``)."""
    B = x0.shape[0]
    k_t, k_z = jax.random.split(key)
    t = jax.random.randint(k_t, (B, 1, 1), 0, schedule.T)
    z = jax.random.normal(k_z, x0.shape, dtype=x0.dtype)
    abar = schedule.alpha_bar[t]
    x_t = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * z
    eps = apply_fn(params, x_t, t.reshape(B, 1).astype(jnp.float32))
    return jnp.mean((eps - z) ** 2)


def _uses_input_grad_kernel(fn, depth: int = 3, seen=None) -> bool:
    """True if ``fn`` IS, closes over, wraps, or references by global
    name the zero-weight-grad attack kernel. Name-matching alone missed
    the repo's own lambda-wrapper idiom (round-3 review find)."""
    if depth < 0 or not callable(fn):
        return False
    seen = seen if seen is not None else set()
    if id(fn) in seen:
        return False
    seen.add(id(fn))
    if getattr(fn, "_zero_weight_grads", False) or \
            getattr(fn, "__name__", "") == \
            "wavenet_forward_pallas_input_grad":
        return True
    for cell in getattr(fn, "__closure__", None) or ():
        try:
            v = cell.cell_contents
        except ValueError:
            continue
        if _uses_input_grad_kernel(v, depth - 1, seen):
            return True
    code = getattr(fn, "__code__", None)
    if code is not None:
        g = getattr(fn, "__globals__", {})
        for name in code.co_names:
            if _uses_input_grad_kernel(g.get(name), depth - 1, seen):
                return True
    for attr in ("func", "__wrapped__"):  # functools.partial / wraps
        if _uses_input_grad_kernel(getattr(fn, attr, None), depth - 1,
                                   seen):
            return True
    return False


def _loss_and_grads(apply_fn: Callable, schedule: DiffusionSchedule,
                    params, x0: jnp.ndarray, key: jax.Array,
                    microbatch: int = -1):
    """value_and_grad of the diffusion MSE, optionally accumulated over
    ``batch/microbatch`` sequential slices (each slice draws its own
    (t, z) — same uniform-t estimator at finer sampling granularity)."""
    B = x0.shape[0]
    if microbatch <= 0 or microbatch == B:
        n_micro = 1
    else:
        assert B % microbatch == 0, (B, microbatch)
        n_micro = B // microbatch
    if n_micro <= 1:
        return jax.value_and_grad(
            lambda p: diffusion_training_loss(apply_fn, p, x0, key,
                                              schedule))(params)
    xm = x0.reshape(n_micro, microbatch, *x0.shape[1:])
    keys = jax.random.split(key, n_micro)

    def micro(carry, inp):
        gsum, lsum = carry
        xi, ki = inp
        li, gi = jax.value_and_grad(
            lambda p: diffusion_training_loss(
                apply_fn, p, xi, ki, schedule))(params)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, gi)
        return (gsum, lsum + li), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (gsum, lsum), _ = jax.lax.scan(
        micro, (zero, jnp.asarray(0.0)), (xm, keys))
    grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
    return lsum / n_micro, grads


def make_train_step(apply_fn: Callable, schedule: DiffusionSchedule,
                    optimizer: optax.GradientTransformation,
                    microbatch: int = -1):
    """Returns ``train_step(state, batch) -> (state, loss)`` (pure, jittable).

    ``microbatch > 0`` accumulates gradients over ``batch/microbatch``
    sequential slices inside the jitted step (the TrainLoop pattern,
    ``training/train_loop.py``) — bounds the activation/stream residency
    of large global batches; each slice draws its own (t, z), so the
    estimator is the same uniform-t MSE at a finer sampling granularity.
    """
    # the whole-net input-grad kernel returns exact-zero weight cotangents
    # by contract (attack path only); wiring it here would silently train
    # nothing (advisor r2) — fail loudly instead
    if _uses_input_grad_kernel(apply_fn):
        raise ValueError(
            "apply_fn is the input-grad-only attack kernel; training needs "
            "weight gradients — use wavenet_forward_pallas_train (whole-net"
            " VJP), wavenet_forward_pallas_grad (per-layer) or the flax "
            "apply")

    def train_step(state: TrainState, x0: jnp.ndarray
                   ) -> Tuple[TrainState, jnp.ndarray]:
        key, sub = jax.random.split(state.key)
        loss, grads = _loss_and_grads(apply_fn, schedule, state.params,
                                      x0, sub, microbatch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, key), loss

    return train_step


def init_train_state(params, optimizer: optax.GradientTransformation,
                     key: jax.Array) -> TrainState:
    return TrainState(jnp.asarray(0), params, optimizer.init(params), key)
