"""Shared flags/factories for the improved-diffusion image CLIs.

Rebuild of ``improved_diffusion/script_util.py:11-228`` (the
``model_and_diffusion_defaults`` / ``sr_model_and_diffusion_defaults``
flag surface and the create functions): one flag group + one factory,
reused by image_train/image_sample/image_nll/super_res_{train,sample}.
The audio repo's fork defaults (32px, 200 steps, dropout 0.3,
``rescale_timesteps=False``) are kept for the plain image scripts; the
SR scripts keep upstream's 256/64 sizes.
"""

from __future__ import annotations

import argparse


def add_model_and_diffusion_flags(parser: argparse.ArgumentParser,
                                  sr: bool = False) -> None:
    g = parser.add_argument_group("model/diffusion")
    if sr:
        g.add_argument("--large_size", type=int, default=256)
        g.add_argument("--small_size", type=int, default=64)
    else:
        g.add_argument("--image_size", type=int, default=32)
    g.add_argument("--dropout", type=float, default=0.3)
    g.add_argument("--num_channels", type=int, default=128)
    g.add_argument("--num_res_blocks", type=int, default=3)
    g.add_argument("--num_heads", type=int, default=4)
    g.add_argument("--num_heads_upsample", type=int, default=-1)
    g.add_argument("--attention_resolutions", default="16,8")
    g.add_argument("--learn_sigma", action="store_true")
    g.add_argument("--sigma_small", action="store_true")
    g.add_argument("--class_cond", action="store_true")
    g.add_argument("--no_scale_shift_norm", action="store_true",
                   help="disable FiLM-style scale-shift norm "
                        "(use_scale_shift_norm=False)")
    g.add_argument("--diffusion_steps", type=int, default=200)
    g.add_argument("--noise_schedule", default="linear")
    g.add_argument("--timestep_respacing", default="")
    g.add_argument("--use_kl", action="store_true")
    g.add_argument("--predict_xstart", action="store_true")
    g.add_argument("--rescale_timesteps", action="store_true")
    g.add_argument("--no_rescale_learned_sigmas", action="store_true")


def create_model_and_diffusion_from_args(args, sr: bool = False):
    """(net, diffusion) per ``script_util.create_model_and_diffusion``
    (``:38-83``) / ``sr_create_model_and_diffusion`` (``:140-185``)."""
    from audiopure_tpu.diffusion.gaussian import create_gaussian_diffusion
    from audiopure_tpu.models.unet import create_sr_unet, create_unet

    common = dict(
        num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks,
        learn_sigma=args.learn_sigma,
        class_cond=args.class_cond,
        attention_resolutions=args.attention_resolutions,
        num_heads=args.num_heads,
        num_heads_upsample=args.num_heads_upsample,
        use_scale_shift_norm=not args.no_scale_shift_norm,
        dropout=args.dropout,
    )
    if sr:
        net = create_sr_unet(large_size=args.large_size,
                             small_size=args.small_size, **common)
    else:
        net = create_unet(image_size=args.image_size, in_channels=3,
                          **common)
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps,
        learn_sigma=args.learn_sigma,
        sigma_small=args.sigma_small,
        noise_schedule=args.noise_schedule,
        use_kl=args.use_kl,
        predict_xstart=args.predict_xstart,
        rescale_timesteps=args.rescale_timesteps,
        rescale_learned_sigmas=not args.no_rescale_learned_sigmas,
        timestep_respacing=args.timestep_respacing,
    )
    return net, diffusion


def load_model_params(model_path: str, ema: str = ""):
    """Restore params from an orbax checkpoint dir written by TrainLoop
    (``--ema 0.9999`` selects that EMA tree, ref samples from EMA
    weights by convention)."""
    from audiopure_tpu.utils import checkpoint as ckpt_lib

    tree = ckpt_lib.restore(model_path)
    if ema:
        key = f"ema_{ema}"
        if key not in tree:
            raise KeyError(f"{key} not in checkpoint "
                           f"(keys: {sorted(tree)})")
        return tree[key]
    return tree["params"] if "params" in tree else tree
