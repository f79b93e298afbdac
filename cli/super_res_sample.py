"""Upsample a batch of base samples with a super-resolution model.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/super_res_sample.py``:
reads the npz written by ``cli.image_sample`` (uint8 NHWC ``arr_0``,
optional labels ``arr_1``), conditions the :class:`SuperResUNet` on each
low-res batch, and writes the large samples as npz (``:40-72``).
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


def load_low_res_batches(base_samples: str, batch_size: int,
                         class_cond: bool):
    """Cycle the base npz into float NCHW conditioning batches
    (ref ``load_data_for_worker:75-98``)."""
    import numpy as np

    obj = np.load(base_samples)
    image_arr = obj["arr_0"]
    label_arr = obj["arr_1"] if class_cond else None
    buffer, label_buffer = [], []
    while True:
        for i in range(len(image_arr)):
            buffer.append(image_arr[i])
            if class_cond:
                label_buffer.append(label_arr[i])
            if len(buffer) == batch_size:
                batch = np.stack(buffer).astype(np.float32) / 127.5 - 1.0
                res = {"low_res": np.transpose(batch, (0, 3, 1, 2))}
                if class_cond:
                    res["y"] = np.stack(label_buffer).astype(np.int32)
                yield res
                buffer, label_buffer = [], []


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--base_samples", required=True)
    parser.add_argument("--ema", default="")
    parser.add_argument("--num_samples", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--use_ddim", action="store_true")
    parser.add_argument("--no_clip_denoised", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    add_model_and_diffusion_flags(parser, sr=True)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.utils import logging as logger

    logger.configure()
    logger.log("creating model...")
    net, diffusion = create_model_and_diffusion_from_args(args, sr=True)
    params = load_model_params(args.model_path, args.ema)

    logger.log("loading data...")
    data = load_low_res_batches(args.base_samples, args.batch_size,
                                args.class_cond)

    shape = (args.batch_size, 3, args.large_size, args.large_size)
    clip = not args.no_clip_denoised

    def sample_batch(key, low_res, y):
        model = lambda x, t, **kw: net.apply(params, x, t, **kw)
        kwargs = {"low_res": low_res}
        if args.class_cond:
            kwargs["y"] = y
        fn = (diffusion.ddim_sample_loop if args.use_ddim
              else diffusion.p_sample_loop)
        sample = fn(model, shape, key, clip_denoised=clip,
                    model_kwargs=kwargs)
        sample = jnp.clip((sample + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return jnp.transpose(sample, (0, 2, 3, 1))

    from audiopure_tpu.utils.jit_utils import hoisted_jit
    sample_jit = hoisted_jit(sample_batch)

    logger.log("creating samples...")
    key = jax.random.PRNGKey(args.seed)
    all_images = []
    while len(all_images) * args.batch_size < args.num_samples:
        kwargs = next(data)
        y = jnp.asarray(kwargs["y"]) if args.class_cond else \
            jnp.zeros((args.batch_size,), jnp.int32)
        key, sub = jax.random.split(key)
        all_images.append(np.asarray(
            sample_jit(sub, jnp.asarray(kwargs["low_res"]), y)))
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    arr = np.concatenate(all_images, axis=0)[:args.num_samples]
    shape_str = "x".join(str(x) for x in arr.shape)
    out_path = os.path.join(logger.get_dir(), f"samples_{shape_str}.npz")
    logger.log(f"saving to {out_path}")
    np.savez(out_path, arr)
    logger.log("sampling complete")
    return out_path


if __name__ == "__main__":
    main()
