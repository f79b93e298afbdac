"""DiffWave unconditional training (SC09 or Qualcomm-KWS).

Rebuild of ``DiffWave_Unconditional/train.py:19-183`` and
``train_qkws.py`` (``--qkws``): Adam lr 2e-4, MSE eps-loss at uniform
random t, checkpoints every ``iters_per_ckpt``, resume via latest step.

The reference's one-process-per-GPU launcher + NCCL all-reduce hooks
(``distributed_train.py:45-70``, ``distributed_util.py:97-149``) do not
exist here: the train step is jitted over a (dp, tp) mesh and the gradient
all-reduce is compiler-emitted (``--dp/--tp``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-c", "--config", default=None,
                        help="JSON config (reference layout accepted)")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--qkws", action="store_true",
                        help="Qualcomm keywords + random-duration collate")
    parser.add_argument("--n_iters", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output_directory", default=None)
    parser.add_argument("--remat", nargs="?", const="block",
                        default=False, choices=["block", "gates"],
                        help="per-block gradient checkpointing (needed "
                             "for the full 36x256 model at batch >= 16 "
                             "on one v5e: without it the step OOMs)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute (f32 params)")
    parser.add_argument("--weight_norm", action="store_true",
                        help="torch-style weight normalization on the "
                             "convs (the reference's training "
                             "parametrization, WaveNet.py:28)")
    parser.add_argument("--dp", type=int, default=-1)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--conv_impl", default="auto",
                        choices=["auto", "xla", "pallas", "pallas_stack"],
                        help="'pallas' trains through the per-layer fused "
                             "kernel's custom VJP; 'pallas_stack' through "
                             "the whole-net layer-resident training VJP "
                             "(both dp-only: need --tp 1, no "
                             "--weight_norm, a TPU backend). 'auto' = "
                             "pallas_stack when eligible under --bf16 "
                             "(measured 65.1-65.6%% MFU at b8-b16 vs "
                             "XLA's 53.0%% at b8, docs/BENCH.md round "
                             "4), else xla")
    parser.add_argument("--microbatch", type=int, default=-1,
                        help="gradient-accumulation slice size inside "
                             "the jitted step (bounds activation/stream "
                             "residency of large batches); -1 = whole "
                             "batch")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audiopure_tpu.config import Config, load_config
    from audiopure_tpu.data import (DataLoader,
                                    QualcommKeywordSpottingDataset,
                                    SC09Dataset)
    from audiopure_tpu.data.loader import infinite, \
        rand_audio_length_collate
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.models.wavenet import make_wavenet
    from audiopure_tpu.parallel import (batch_sharding, make_mesh,
                                        replicated, shard_params_tp)
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)
    from audiopure_tpu.utils import checkpoint as ckpt_lib
    from audiopure_tpu.utils import logging as logger

    cfg = load_config(args.config) if args.config else Config()
    n_iters = args.n_iters or cfg.train.n_iters
    out_dir = args.output_directory or cfg.train.output_directory
    data_path = args.data_path or cfg.trainset.data_path
    logger.configure(os.path.join(out_dir, "logs"))

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    dp = mesh.shape["dp"]
    batch_size = args.batch_size or cfg.train.batch_size_per_gpu * dp
    seg = cfg.trainset.segment_length

    if args.qkws:
        ds = QualcommKeywordSpottingDataset(
            data_path, transform=Compose([LoadAudio()]), split="train")
        collate = rand_audio_length_collate(
            rng=np.random.default_rng(args.seed))
        loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                            collate_fn=collate, seed=args.seed)
    else:
        ds = SC09Dataset(data_path, transform=Compose(
            [LoadAudio(), FixAudioLength(seg / 16000)]))
        loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                            seed=args.seed)

    net = make_wavenet(cfg.wavenet)
    if args.weight_norm or args.remat or args.bf16:
        import dataclasses
        net = dataclasses.replace(
            net, weight_norm=args.weight_norm, remat=args.remat,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    key = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, 1, seg))
    params = net.init(key, x0, jnp.zeros((1, 1)))
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(params))
    print(f"WaveNet Parameters: {n_params / 1e6:.6f}M")

    schedule = make_schedule(cfg.diffusion.T, cfg.diffusion.beta_0,
                             cfg.diffusion.beta_T)
    optimizer = optax.adam(cfg.train.learning_rate)
    state = init_train_state(params, optimizer, jax.random.PRNGKey(
        args.seed + 1))

    # resume (ref ``train.py:82-101``)
    start = ckpt_lib.find_max_step(out_dir)
    if start >= 0:
        restored = ckpt_lib.restore(out_dir, start, template={
            "params": state.params, "opt_state": state.opt_state})
        state = state._replace(params=restored["params"],
                               opt_state=restored["opt_state"],
                               step=jnp.asarray(start))
        print(f"resumed from iteration {start}")
        n_iter = start
    else:
        n_iter = 0

    param_sharding = shard_params_tp(params, mesh)
    rep = replicated(mesh)
    state_sharding = type(state)(
        step=rep, params=param_sharding,
        opt_state=jax.tree_util.tree_map(lambda _: rep, state.opt_state),
        key=rep)
    apply_fn = net.apply
    if args.conv_impl == "auto":
        eligible = (args.tp == 1 and not args.weight_norm and args.bf16
                    and jax.default_backend() in ("tpu", "axon"))
        args.conv_impl = "pallas_stack" if eligible else "xla"
        print(f"conv_impl auto -> {args.conv_impl}")
    if args.conv_impl in ("pallas", "pallas_stack"):
        unsupported = (args.tp != 1 or args.weight_norm
                       or jax.default_backend() not in ("tpu", "axon"))
        if unsupported:
            print(f"WARNING: --conv_impl {args.conv_impl} needs --tp 1, "
                  "no --weight_norm and a TPU backend; using xla")
        else:
            if args.conv_impl == "pallas_stack":
                from audiopure_tpu.kernels.wavenet_stack_train import \
                    wavenet_forward_pallas_train as fwd
            else:
                from audiopure_tpu.kernels.wavenet_block_grad import \
                    wavenet_forward_pallas_grad as fwd
            w = cfg.wavenet
            kdtype = jnp.bfloat16 if args.bf16 else jnp.float32
            apply_fn = lambda p, xx, tt: fwd(
                p, xx, tt, num_res_layers=w.num_res_layers,
                dilation_cycle=w.dilation_cycle,
                embed_dim_in=w.diffusion_step_embed_dim_in,
                dtype=kdtype).astype(jnp.float32)
    if apply_fn is not net.apply and mesh.shape["dp"] > 1:
        # fused-kernel forward on a dp mesh: the SPMD partitioner treats
        # the Mosaic custom call as opaque and may gather the batch —
        # shard_map pins each device to its local shard (one explicit
        # gradient pmean; parallel/dp_kernel.py)
        from audiopure_tpu.parallel import make_dp_train_step
        state_sharding = jax.tree_util.tree_map(lambda _: rep,
                                                state_sharding)
        train_step = jax.jit(
            make_dp_train_step(apply_fn, schedule, optimizer, mesh,
                               microbatch=args.microbatch))
    else:
        train_step = jax.jit(
            make_train_step(apply_fn, schedule, optimizer,
                            microbatch=args.microbatch),
            in_shardings=(state_sharding, batch_sharding(mesh)),
            out_shardings=(state_sharding, rep))
    state = jax.device_put(state, state_sharding)

    data_iter = infinite(loader)
    with mesh:
        while n_iter < n_iters:
            batch = next(data_iter)
            x = jnp.asarray(batch["samples"])[:, None, :]
            x = jax.device_put(x, batch_sharding(mesh))
            state, loss = train_step(state, x)
            n_iter += 1
            if n_iter % cfg.train.iters_per_logging == 0:
                logger.logkv("iteration", n_iter)
                logger.logkv("loss", float(loss))
                logger.dumpkvs()
            if n_iter % cfg.train.iters_per_ckpt == 0:
                ckpt_lib.save(out_dir, n_iter, {
                    "params": jax.device_get(state.params),
                    "opt_state": jax.device_get(state.opt_state)})
                print(f"saved checkpoint at iteration {n_iter}")
    final_loss = float(loss)
    print(f"training finished at iteration {n_iter}, "
          f"loss {final_loss:.4f}")
    return final_loss


if __name__ == "__main__":
    main()
