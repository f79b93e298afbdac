"""Super-resolution diffusion training.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/super_res_train.py``:
trains a :class:`SuperResUNet` on large images conditioned on their
area-downsampled ``low_res`` versions (``load_superres_data:63-72``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from cli._image_util import (add_model_and_diffusion_flags,
                             create_model_and_diffusion_from_args)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--schedule_sampler", default="uniform",
                        choices=["uniform", "loss-second-moment"])
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--lr_anneal_steps", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--microbatch", type=int, default=-1)
    parser.add_argument("--ema_rate", default="0.9999")
    parser.add_argument("--log_interval", type=int, default=10)
    parser.add_argument("--save_interval", type=int, default=10000)
    parser.add_argument("--resume_checkpoint", default="")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--async_save", action="store_true")
    add_model_and_diffusion_flags(parser, sr=True)
    args = parser.parse_args(argv)

    from audiopure_tpu.data.images import load_superres_data
    from audiopure_tpu.training.samplers import \
        create_named_schedule_sampler
    from audiopure_tpu.training.train_loop import TrainLoop
    from audiopure_tpu.utils import logging as logger

    logger.configure()
    logger.log("creating model and diffusion...")
    net, diffusion = create_model_and_diffusion_from_args(args, sr=True)

    import jax
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 3, args.large_size, args.large_size))
    lr0 = jnp.zeros((1, 3, args.small_size, args.small_size))
    y0 = jnp.zeros((1,), jnp.int32) if args.class_cond else None
    params = jax.jit(net.init)(jax.random.PRNGKey(args.seed), x0,
                               jnp.zeros((1,)), low_res=lr0, y=y0)

    def apply_fn(p, x, t, **cond):
        return net.apply(p, x, t, **cond)

    logger.log("creating data loader...")
    data = load_superres_data(args.data_dir, args.batch_size,
                              large_size=args.large_size,
                              small_size=args.small_size,
                              class_cond=args.class_cond, seed=args.seed)

    logger.log("training...")
    cond_keys = ("low_res", "y") if args.class_cond else ("low_res",)
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
        input_key="image", cond_keys=cond_keys,
        seed=args.seed, async_save=args.async_save)
    loop.run_loop(max_steps=args.max_steps)
    loop.save(async_save=False)
    return loop.step


if __name__ == "__main__":
    main()
