"""dp-sharded execution of the Mosaic (pallas) kernel paths.

The ``--dp`` eval layout (``cli/common.py:make_eval_sharding``) relies on
the XLA SPMD partitioner: inputs carry batch shardings and every op is
partitioned automatically. That works for plain XLA ops, but a Mosaic
custom call is opaque to the partitioner — without a sharding rule it may
replicate the call and all-gather the batch instead of splitting it
(docs/ROADMAP.md item 4). These wrappers make the partitioning *manual
and guaranteed*: ``shard_map`` over the ``dp`` mesh axis runs the wrapped
computation on each device's LOCAL batch shard with replicated params, so
the eval paths contain zero cross-device collectives by construction and
the training path's only collective is one explicit gradient ``pmean``.

This is the TPU replacement for the reference's bucketed-NCCL gradient
hooks and ``DistributedSampler`` eval split
(``DiffWave_Unconditional/distributed_util.py:97-149``) on the
fused-kernel paths; the plain-XLA paths keep the jit+NamedSharding layout
(``parallel/mesh.py``), where the partitioner is trusted.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audiopure_tpu.diffusion.schedule import DiffusionSchedule
from audiopure_tpu.training.diffwave import (TrainState, _loss_and_grads,
                                             _uses_input_grad_kernel)


def dp_shard_apply(apply_fn: Callable, mesh: Mesh, axis: str = "dp"
                   ) -> Callable:
    """Wrap an eps-net forward ``apply_fn(params, x, t) -> eps`` so the
    kernel executes per-device on the local batch shard.

    ``params`` replicated, ``x``/``t`` sharded on their leading (batch)
    dim, output sharded the same way. Static kwargs must already be bound
    (``functools.partial``). The batch must divide the ``axis`` size.
    """
    def local(params, x, t):
        return apply_fn(params, x, t)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(), P(axis), P(axis)),
                     out_specs=P(axis), check_rep=False)


def dp_shard_eval(fn: Callable, mesh: Mesh, axis: str = "dp") -> Callable:
    """Wrap a whole stochastic eval step ``fn(x, key) -> out`` (e.g.
    purify -> transform -> classify) in ``shard_map`` over ``axis``.

    Every op inside — vmaps, scans, Mosaic custom calls — runs on the
    local batch shard; the compiled program has no collectives at all
    (test-asserted in ``tests/test_dp_kernel.py``). The PRNG key is
    replicated and folded with the device index so purification noise
    stays independent across shards (single-device bitstreams are not
    reproduced — same estimator, different draws; the partitioner-based
    layout decorrelates draws across shards the same way).
    """
    def local(x, key):
        return fn(x, jax.random.fold_in(key, lax.axis_index(axis)))

    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P()),
                     out_specs=P(axis), check_rep=False)


def make_dp_train_step(apply_fn: Callable, schedule: DiffusionSchedule,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, axis: str = "dp",
                       microbatch: int = -1) -> Callable:
    """DiffWave train step with the batch sharded over ``axis`` and the
    fused-kernel forward/backward guaranteed to run on local shards.

    Same contract as ``training.diffwave.make_train_step`` —
    ``step(state, x0) -> (state, loss)``, jittable, state replicated —
    but the gradient all-reduce is one explicit ``lax.pmean`` instead of
    a partitioner-inferred collective, so a Mosaic custom call in
    ``apply_fn`` (``--conv_impl pallas_stack``) can never force a batch
    gather. Each shard folds the device index into its RNG: (t, z) are
    drawn per-shard (same uniform-t estimator, finer granularity — the
    ``microbatch`` convention).
    """
    if _uses_input_grad_kernel(apply_fn):
        raise ValueError(
            "apply_fn is the input-grad-only attack kernel; training "
            "needs weight gradients — use wavenet_forward_pallas_train, "
            "wavenet_forward_pallas_grad or the flax apply")

    def local_step(state: TrainState, x_local: jnp.ndarray):
        key, sub = jax.random.split(state.key)
        sub = jax.random.fold_in(sub, lax.axis_index(axis))
        loss, grads = _loss_and_grads(apply_fn, schedule, state.params,
                                      x_local, sub, microbatch)
        grads = lax.pmean(grads, axis)
        loss = lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, key), loss

    return shard_map(local_step, mesh=mesh,
                     in_specs=(P(), P(axis)),
                     out_specs=(P(), P()), check_rep=False)
