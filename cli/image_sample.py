"""Sample a batch of images from a trained diffusion model into an npz.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/image_sample.py``:
ancestral (or DDIM) sampling, optional random class conditioning, uint8
NHWC npz output for FID evaluation (``:40-78``). The reference's
all-gather across ranks becomes one jitted scan loop per batch on the
controller; a dp mesh shards the batch across chips.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from cli._image_util import (add_model_and_diffusion_flags,
                             create_model_and_diffusion_from_args,
                             load_model_params)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--ema", default="",
                        help="sample from this EMA rate's weights, e.g. "
                             "0.9999")
    parser.add_argument("--num_samples", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--use_ddim", action="store_true")
    parser.add_argument("--no_clip_denoised", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    add_model_and_diffusion_flags(parser)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.models.unet import NUM_CLASSES
    from audiopure_tpu.utils import logging as logger

    logger.configure()
    logger.log("creating model and diffusion...")
    net, diffusion = create_model_and_diffusion_from_args(args)
    params = load_model_params(args.model_path, args.ema)

    shape = (args.batch_size, 3, args.image_size, args.image_size)
    clip = not args.no_clip_denoised

    def sample_batch(key, y):
        model = lambda x, t, **kw: net.apply(params, x, t, **kw)
        kwargs = {"y": y} if args.class_cond else {}
        fn = (diffusion.ddim_sample_loop if args.use_ddim
              else diffusion.p_sample_loop)
        sample = fn(model, shape, key, clip_denoised=clip,
                    model_kwargs=kwargs)
        sample = jnp.clip((sample + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return jnp.transpose(sample, (0, 2, 3, 1))  # NHWC (ref ``:58-60``)

    from audiopure_tpu.utils.jit_utils import hoisted_jit
    sample_jit = hoisted_jit(sample_batch)

    logger.log("sampling...")
    key = jax.random.PRNGKey(args.seed)
    all_images, all_labels = [], []
    while len(all_images) * args.batch_size < args.num_samples:
        key, k_y, k_s = jax.random.split(key, 3)
        y = jax.random.randint(k_y, (args.batch_size,), 0, NUM_CLASSES) \
            if args.class_cond else jnp.zeros((args.batch_size,),
                                              jnp.int32)
        all_images.append(np.asarray(sample_jit(k_s, y)))
        if args.class_cond:
            all_labels.append(np.asarray(y))
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    arr = np.concatenate(all_images, axis=0)[:args.num_samples]
    shape_str = "x".join(str(x) for x in arr.shape)
    out_path = os.path.join(logger.get_dir(), f"samples_{shape_str}.npz")
    logger.log(f"saving to {out_path}")
    if args.class_cond:
        labels = np.concatenate(all_labels, axis=0)[:args.num_samples]
        np.savez(out_path, arr, labels)
    else:
        np.savez(out_path, arr)
    logger.log("sampling complete")
    return out_path


if __name__ == "__main__":
    main()
