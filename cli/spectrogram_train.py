"""Improved-Diffusion training on SC09 mel-spectrograms.

Rebuild of ``Improved_Diffusion_Unconditional/spectrogram_train.py:18-59``
+ ``spect_train_mpi_run.sh`` (16 MPI ranks, bs=230, 200 linear steps): the
UNet trains on [-1,1]-standardized 32x32 log-mels through the TrainLoop
(microbatching, EMA, importance sampling). The MPI/NCCL rendezvous is
replaced by the single-controller mesh; multi-chip batch sharding comes
from jit on the mesh.
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
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--microbatch", type=int, default=-1)
    parser.add_argument("--ema_rate", default="0.9999")
    parser.add_argument("--diffusion_steps", type=int, default=200)
    parser.add_argument("--noise_schedule", default="linear")
    parser.add_argument("--schedule_sampler", default="uniform",
                        choices=["uniform", "loss-second-moment"])
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--lr_anneal_steps", type=int, default=0)
    parser.add_argument("--log_interval", type=int, default=10)
    parser.add_argument("--save_interval", type=int, default=10000)
    parser.add_argument("--resume_checkpoint", default="")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--model_channels", type=int, default=128)
    parser.add_argument("--unet_conv", default="xla",
                        choices=["xla", "pallas", "pallas_fused"],
                        help="3x3 conv impl (kernels/unet_conv.py); "
                             "same param tree either way")
    parser.add_argument("--num_res_blocks", type=int, default=3)
    parser.add_argument("--dropout", type=float, default=0.3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--async_save", action="store_true",
        help="commit periodic checkpoints in a background thread so "
             "training steps overlap the write")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audiopure_tpu.data.datasets import SC09SpectrogramDataset
    from audiopure_tpu.data.loader import DataLoader, infinite
    from audiopure_tpu.diffusion.gaussian import create_gaussian_diffusion
    from audiopure_tpu.diffusion.spec_purifier import melspec_standardize
    from audiopure_tpu.models.unet import create_unet
    from audiopure_tpu.training.samplers import \
        create_named_schedule_sampler
    from audiopure_tpu.training.train_loop import TrainLoop
    from audiopure_tpu.utils import logging as logger

    logger.configure()
    logger.log("creating model and diffusion...")

    net = create_unet(num_channels=args.model_channels,
                      num_res_blocks=args.num_res_blocks,
                      dropout=args.dropout, conv_impl=args.unet_conv)
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps, noise_schedule=args.noise_schedule)

    x0 = jnp.zeros((1, 1, 32, 32))
    params = jax.jit(net.init)(jax.random.PRNGKey(args.seed), x0,
                               jnp.zeros((1,)))

    def apply_fn(p, x, t):
        return net.apply(p, x, t)

    logger.log("creating data loader...")
    ds = SC09SpectrogramDataset(args.data_dir)
    data = infinite(DataLoader(ds, args.batch_size, shuffle=True,
                               drop_last=True, seed=args.seed))

    logger.log("training...")
    loop = TrainLoop(
        apply_fn, params, diffusion, data,
        batch_size=args.batch_size, microbatch=args.microbatch,
        lr=args.lr, ema_rate=args.ema_rate,
        log_interval=args.log_interval, save_interval=args.save_interval,
        resume_checkpoint=args.resume_checkpoint,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        schedule_sampler=create_named_schedule_sampler(
            args.schedule_sampler, diffusion),
        preprocess=lambda x: melspec_standardize(jnp.asarray(x)),
        seed=args.seed, async_save=args.async_save)
    loop.run_loop(max_steps=args.max_steps)
    loop.save(async_save=False)
    return loop.step


if __name__ == "__main__":
    main()
