"""Evaluate a diffusion model's NLL (bits/dim) over an image directory.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/image_nll.py``:
deterministic loader -> ``calc_bpd_loop`` per batch -> running mean bpd +
per-timestep vb/mse/xstart_mse term npz dumps (``:50-83``).
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
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--ema", default="")
    parser.add_argument("--num_samples", type=int, default=1000)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--no_clip_denoised", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    add_model_and_diffusion_flags(parser)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.data.images import load_image_data
    from audiopure_tpu.utils import logging as logger

    logger.configure()
    logger.log("creating model and diffusion...")
    net, diffusion = create_model_and_diffusion_from_args(args)
    params = load_model_params(args.model_path, args.ema)

    logger.log("creating data loader...")
    data = load_image_data(args.data_dir, args.batch_size,
                           args.image_size, class_cond=args.class_cond,
                           deterministic=True, seed=args.seed)

    clip = not args.no_clip_denoised

    from audiopure_tpu.utils.jit_utils import hoisted_jit

    @hoisted_jit
    def bpd_batch(x, y, key):
        model = lambda xx, tt, **kw: net.apply(params, xx, tt, **kw)
        kwargs = {"y": y} if args.class_cond else {}
        return diffusion.calc_bpd_loop(model, x, key,
                                       clip_denoised=clip,
                                       model_kwargs=kwargs)

    logger.log("evaluating...")
    key = jax.random.PRNGKey(args.seed)
    all_bpd = []
    all_metrics = {"vb": [], "mse": [], "xstart_mse": []}
    num_complete = 0
    while num_complete < args.num_samples:
        batch = next(data)
        x = jnp.asarray(batch["image"])
        y = jnp.asarray(batch["y"]) if args.class_cond else \
            jnp.zeros((x.shape[0],), jnp.int32)
        key, sub = jax.random.split(key)
        metrics = bpd_batch(x, y, sub)
        for name, term_list in all_metrics.items():
            term_list.append(np.asarray(metrics[name]).mean(axis=0))
        all_bpd.append(float(metrics["total_bpd"].mean()))
        num_complete += x.shape[0]
        logger.log(f"done {num_complete} samples: "
                   f"bpd={np.mean(all_bpd)}")

    for name, terms in all_metrics.items():
        out_path = os.path.join(logger.get_dir(), f"{name}_terms.npz")
        logger.log(f"saving {name} terms to {out_path}")
        np.savez(out_path, np.mean(np.stack(terms), axis=0))
    logger.log("evaluation complete")
    return float(np.mean(all_bpd))


if __name__ == "__main__":
    main()
