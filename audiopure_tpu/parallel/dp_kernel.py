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


def dp_shard_attack(attack, mesh: Mesh, axis: str = "dp") -> Callable:
    """dp-sharded EOT-PGD stage 1: each device runs the FULL attack
    program on its local batch shard.

    The north-star multi-chip workload is ``AudioAttack.generate`` under
    data parallelism with the Mosaic eps-net — per-example PGD
    bookkeeping is embarrassingly parallel (masked per-example updates,
    no cross-example reductions in the loop, ``attacks/pgd.py``), so the
    compiled per-chip program has ZERO collectives by construction
    (test-asserted in ``tests/test_dp_kernel.py``); robust-accuracy
    reductions happen at the metric boundary on host, exactly like the
    reference's per-rank eval + final gather
    (``DiffWave_Unconditional/distributed_util.py:97-149`` replaced).

    Returns ``generate(x, y, key, targeted=False) ->
    (x_adv, (success, None))`` — the stage-1 slice of the
    ``AudioAttack.generate`` contract. ``x``/``y`` batch must divide the
    ``axis`` size. PRNG: the key is split once over the dp axis, so each
    shard draws an independent stream (same estimator as single-device,
    different draws — the ``dp_shard_eval`` convention). Honors
    ``attack.segment_iters`` (the ~60 s execution-watchdog bound) with
    the host-side segment loop OUTSIDE shard_map: per-shard segment keys
    are the same split the monolithic program computes, so segmented and
    monolithic dp trajectories are identical (test-pinned). Weights are
    hoisted to runtime args (``hoisted_jit``) — without it the eps-net
    literals inline per program (692 MB StableHLO, HTTP 413).
    """
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    if attack.max_iter_2 > 0:
        raise ValueError(
            "dp_shard_attack covers stage 1 (EOT-PGD); run stage 2 "
            "(imperceptible) per shard on host or with max_iter_2=0")

    dp = mesh.shape[axis]
    n_iter = attack.max_iter_1
    seg = attack.segment_iters
    cache: dict = {}

    def _mono_raw(targeted: bool):
        def local(x, y, keys_dp):
            return attack._stage_1_impl(x, y, keys_dp[0],
                                        targeted=targeted)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)), check_rep=False)

    def _seg_raw(targeted: bool):
        def local(x, y, keys_seg_dp, delta, x_adv, success):
            body, _ = attack._make_body(x, y, targeted)
            carry, _ = lax.scan(body, (delta, x_adv, success),
                                keys_seg_dp[0])
            return carry
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis), P(axis)), check_rep=False)

    def _tail_raw(targeted: bool):
        def local(x, y, keys_dp, delta, x_adv, success):
            return attack._tail_impl(x, y, keys_dp[0], delta, x_adv,
                                     success, targeted=targeted)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis)), check_rep=False)

    def _mono(targeted: bool):
        return hoisted_jit(_mono_raw(targeted))

    def _seg(targeted: bool):
        return hoisted_jit(_seg_raw(targeted))

    def _tail(targeted: bool):
        return hoisted_jit(_tail_raw(targeted))

    def generate(x, y, key, targeted: bool = False):
        if x.shape[0] % dp:
            raise ValueError(f"batch {x.shape[0]} must divide "
                             f"{axis}={dp}")
        # one independent key per shard; stage-2 split mirrors
        # AudioAttack.generate so per-shard draws never collide with a
        # hypothetical stage-2 stream
        k1, _ = jax.random.split(key)
        keys_dp = jax.random.split(k1, dp)
        if seg <= 0 or seg >= n_iter:
            fns = cache.setdefault(("mono", targeted),
                                   _mono(targeted))
            x_adv, success = fns(x, y, keys_dp)
            return x_adv, (success, None)

        # per-shard iteration keys: the SAME split _stage_1_impl computes
        # from its shard key, precomputed host-side and sliced per segment
        keys_all = jax.vmap(
            lambda k: jax.random.split(k, n_iter + 1))(keys_dp)
        seg_fn = cache.setdefault(("seg", targeted), _seg(targeted))
        tail_fn = cache.setdefault(("tail", targeted), _tail(targeted))
        delta = jnp.zeros_like(x)
        x_adv = x
        success = jnp.zeros(x.shape[0], dtype=bool)
        pos = 0
        while pos < n_iter:
            n = min(seg, n_iter - pos)
            delta, x_adv, success = seg_fn(
                x, y, keys_all[:, pos:pos + n], delta, x_adv, success)
            pos += n
        x_adv, success = tail_fn(x, y, keys_all[:, -1], delta, x_adv,
                                 success)
        return x_adv, (success, None)

    # expose the raw sharded stage-1 builders for collective accounting
    # (tests compile these and assert zero collectives)
    generate._mono_sharded = _mono_raw
    generate._seg_sharded = _seg_raw
    return generate


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
