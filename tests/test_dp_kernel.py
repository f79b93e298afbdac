"""shard_map-guaranteed dp partitioning of the Mosaic kernel paths
(parallel/dp_kernel.py): eval paths compile with ZERO cross-device
collectives, the train step's only collective is the gradient pmean, and
numerics match the unsharded programs (interpret-mode kernels on the
virtual 8-device CPU mesh; Mosaic itself runs on the TPU via bench.py).

Replaces-by-construction check for the reference's NCCL eval/grad hooks
(``DiffWave_Unconditional/distributed_util.py:97-149``)."""

import functools

import numpy as np

import flax
import jax
import jax.numpy as jnp
import optax

from audiopure_tpu.diffusion import make_schedule
from audiopure_tpu.diffusion.vpsde import RevDiffWave
from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
from audiopure_tpu.kernels.wavenet_stack_train import \
    wavenet_forward_pallas_train
from audiopure_tpu.models.wavenet import WaveNet
from audiopure_tpu.parallel import (batch_sharding, collective_stats,
                                    dp_shard_apply, dp_shard_eval,
                                    make_dp_train_step, make_mesh)
from audiopure_tpu.training.diffwave import (_loss_and_grads,
                                             init_train_state)

DP = 8


def _net_and_params(L=512):
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=4,
                  dilation_cycle=2, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    x = jnp.zeros((1, 1, L))
    params = flax.core.unfreeze(
        net.init(jax.random.PRNGKey(1), x, jnp.zeros((1, 1))))
    # flax zero-inits the final conv (DiffWave convention) — randomize it
    # so parity checks compare non-trivial outputs
    params["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        params["params"]["final_conv2"]["kernel"].shape) * 0.1
    return net, params


def test_dp_shard_apply_matches_unsharded():
    """The pallas eps-net forward under shard_map(dp=8) equals the
    unsharded kernel call, and its compiled program has no collectives."""
    mesh = make_mesh(dp=DP, tp=1)
    _, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(0), (DP * 2, 1, 512)) * 0.3
    t = jnp.arange(DP * 2, dtype=jnp.float32).reshape(-1, 1)

    kfn = functools.partial(
        wavenet_forward_pallas, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, tile_l=128, block_impl="v3",
        interpret=True)
    want = np.asarray(kfn(params, x, t))

    sharded = dp_shard_apply(kfn, mesh)
    with mesh:
        got = jax.jit(sharded)(params, x, t)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                               rtol=1e-4)

    with mesh:
        stats = collective_stats(sharded, params, x, t)
    assert stats["total_count"] == 0, stats["ops"]


def test_dp_shard_eval_zero_collectives_and_shards_batch():
    """Whole eval step (VP-SDE purify -> linear classify) over dp=8:
    compiled program is collective-free and per-shard outputs land on
    their own device."""
    mesh = make_mesh(dp=DP, tp=1)
    net, params = _net_and_params()
    kfn = functools.partial(
        wavenet_forward_pallas, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, tile_l=128, block_impl="v3",
        interpret=True)
    defender = RevDiffWave(lambda xx, tt: kfn(params, xx, tt), T=50, t=2)
    w = jax.random.normal(jax.random.PRNGKey(3), (512, 10)) * 0.01

    def eval_step(x, key):
        purified = defender(x, key)
        return purified.reshape(purified.shape[0], -1) @ w

    x = jax.random.normal(jax.random.PRNGKey(0), (DP, 1, 512)) * 0.3
    sharded = dp_shard_eval(eval_step, mesh)
    with mesh:
        stats = collective_stats(sharded, x, jax.random.PRNGKey(7))
        logits = jax.jit(sharded)(x, jax.random.PRNGKey(7))
    assert stats["total_count"] == 0, stats["ops"]
    assert logits.shape == (DP, 10)
    assert bool(jnp.isfinite(logits).all())

    # per-shard draws are decorrelated (fold_in axis_index): two shards
    # fed the same waveform purify differently
    x_same = jnp.broadcast_to(x[:1], x.shape)
    with mesh:
        out = jax.jit(dp_shard_eval(
            lambda xx, kk: defender(xx, kk), mesh))(
                x_same, jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[DP - 1]))


def test_make_dp_train_step_matches_manual_and_one_allreduce():
    """dp train step on the whole-net pallas training VJP: params equal a
    manual per-shard grad average + optimizer step, and the compiled
    program's collectives are all-reduces only (the pmean) — no gathers.
    """
    mesh = make_mesh(dp=DP, tp=1)
    _, params = _net_and_params(L=800)
    schedule = make_schedule(50, 1e-4, 0.02)
    optimizer = optax.adam(2e-4)
    apply_fn = functools.partial(
        wavenet_forward_pallas_train, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, interpret=True)

    B = DP * 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 800)) * 0.3
    state = init_train_state(params, optimizer, jax.random.PRNGKey(5))

    step = make_dp_train_step(apply_fn, schedule, optimizer, mesh)
    with mesh:
        new_state, loss = jax.jit(step)(state, x)
        stats = collective_stats(step, state, x)
    kinds = set(stats["ops"])
    assert not any("gather" in k or "scatter" in k for k in kinds), kinds

    # manual replica of the sharded computation on one device
    key, sub = jax.random.split(state.key)
    losses, grads = [], []
    per = B // DP
    for i in range(DP):
        ki = jax.random.fold_in(sub, i)
        li, gi = _loss_and_grads(apply_fn, schedule, state.params,
                                 x[i * per:(i + 1) * per], ki)
        losses.append(li)
        grads.append(gi)
    gmean = jax.tree_util.tree_map(
        lambda *g: sum(g) / DP, *grads)
    updates, _ = optimizer.update(gmean, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(float(loss),
                               float(sum(losses) / DP), rtol=1e-6)
    for got, want in zip(jax.tree_util.tree_leaves(new_state.params),
                         jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-5)


def _defended_attack(seg=0, eot=2, iters=4):
    """Tiny defended-system EOT-PGD attack on the pallas eps-net path:
    VP-SDE purify (Mosaic kernel, interpret on CPU) -> linear classify."""
    net, params = _net_and_params()
    kfn = functools.partial(
        wavenet_forward_pallas, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, tile_l=128, block_impl="v3",
        interpret=True)
    defender = RevDiffWave(lambda xx, tt: kfn(params, xx, tt), T=50, t=2)
    w = jax.random.normal(jax.random.PRNGKey(3), (512, 10)) * 0.05

    def model_fn(x, key):
        purified = defender(x, key)
        return purified.reshape(purified.shape[0], -1) @ w

    from audiopure_tpu.attacks import AudioAttack
    return AudioAttack(model_fn, eps=0.02, norm="linf",
                       learning_rate_1=0.02 / 5, max_iter_1=iters,
                       eot_attack_size=eot, eot_defense_size=eot,
                       segment_iters=seg)


def test_dp_shard_attack_zero_collectives_and_matches_per_shard():
    """The dp attack program (AudioAttack.generate stage 1 with the
    Mosaic eps-net) compiles with ZERO collectives — per-example PGD
    bookkeeping is embarrassingly parallel, reductions happen only at
    the host metric boundary — and its outputs equal running the
    unsharded stage-1 program per shard with that shard's key.

    This is the north-star multi-chip eval workload (VERDICT r4 item 4):
    the reference's only real distributed pattern
    (``distributed_util.py:97-149``) applied at attack time."""
    from audiopure_tpu.parallel import dp_shard_attack

    mesh = make_mesh(dp=DP, tp=1)
    atk = _defended_attack()
    B = DP * 2
    # keep |x| < 1 so the [-1, 1] clip never exceeds the linf ball
    # (out-of-range samples legitimately get |x_adv - x| > eps from the
    # valid-range clip, as in the reference)
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(0),
                                   (B, 1, 512)) * 0.3, -0.95, 0.95)
    y = jnp.arange(B, dtype=jnp.int32) % 10
    key = jax.random.PRNGKey(11)

    gen = dp_shard_attack(atk, mesh)
    x_adv, (succ, succ2) = gen(x, y, key)
    assert succ2 is None
    assert x_adv.shape == x.shape and succ.shape == (B,)
    assert succ.dtype == jnp.bool_
    assert bool(jnp.isfinite(x_adv).all())
    # the attack moved the input within the linf ball
    dmax = float(jnp.abs(x_adv - x).max())
    assert 0 < dmax <= 0.02 + 1e-6

    # collective accounting on the actual compiled stage-1 program
    k1, _ = jax.random.split(key)
    keys_dp = jax.random.split(k1, DP)
    with mesh:
        stats = collective_stats(gen._mono_sharded(False), x, y, keys_dp)
    assert stats["total_count"] == 0, stats["ops"]

    # per-shard semantics: shard i of the dp output == the unsharded
    # stage-1 program on shard i's slice with shard i's key
    per = B // DP
    for i in (0, DP - 1):
        sl = slice(i * per, (i + 1) * per)
        want_adv, want_succ = atk._stage_1_impl(
            x[sl], y[sl], keys_dp[i], targeted=False)
        np.testing.assert_allclose(np.asarray(x_adv[sl]),
                                   np.asarray(want_adv),
                                   atol=1e-5, rtol=1e-4)
        assert bool((succ[sl] == want_succ).all())


def test_dp_shard_attack_segmented_matches_monolithic():
    """segment_iters under dp (the watchdog-bounded dispatch schedule)
    produces the identical trajectory to the monolithic dp program, and
    the segment program is also collective-free."""
    from audiopure_tpu.parallel import dp_shard_attack

    mesh = make_mesh(dp=DP, tp=1)
    B = DP
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 512)) * 0.3
    y = jnp.arange(B, dtype=jnp.int32) % 10
    key = jax.random.PRNGKey(13)

    gen_mono = dp_shard_attack(_defended_attack(seg=0), mesh)
    gen_seg = dp_shard_attack(_defended_attack(seg=3), mesh)
    adv_m, (succ_m, _) = gen_mono(x, y, key)
    adv_s, (succ_s, _) = gen_seg(x, y, key)
    np.testing.assert_allclose(np.asarray(adv_s), np.asarray(adv_m),
                               atol=1e-6, rtol=1e-6)
    assert bool((succ_s == succ_m).all())

    atk = _defended_attack(seg=3)
    gen = dp_shard_attack(atk, mesh)
    k1, _ = jax.random.split(key)
    keys_dp = jax.random.split(k1, DP)
    keys_all = jax.vmap(
        lambda k: jax.random.split(k, atk.max_iter_1 + 1))(keys_dp)
    delta = jnp.zeros_like(x)
    succ0 = jnp.zeros((B,), dtype=bool)
    with mesh:
        stats = collective_stats(gen._seg_sharded(False), x, y,
                                 keys_all[:, :3], delta, x, succ0)
    assert stats["total_count"] == 0, stats["ops"]


def test_dp_shard_attack_rejects_stage2():
    from audiopure_tpu.parallel import dp_shard_attack

    mesh = make_mesh(dp=DP, tp=1)
    atk = _defended_attack()
    atk.max_iter_2 = 5
    import pytest
    with pytest.raises(ValueError, match="stage 1"):
        dp_shard_attack(atk, mesh)
