"""Unconditional DiffWave sampling.

Rebuild of ``DiffWave_Unconditional/inference.py:16-127``: full-T ancestral
generation with wall-clock timing, wav dumps (and waveform PNGs in place of
TensorBoard audio).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("--ckpt_path", required=True,
                        help="orbax dir or torch .pkl")
    parser.add_argument("-n", "--num_samples", type=int, default=4)
    parser.add_argument("--fast", type=int, default=0, metavar="K",
                        help="K-step respaced fast sampling instead of "
                             "full-T (ref fast_reverse, "
                             "diffwave_ddpm.py:106-141)")
    parser.add_argument("--output_directory", default="speeches")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.config import Config, load_config
    from audiopure_tpu.diffusion.ddpm import DDPMPurifier
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.models.wavenet import make_wavenet
    from audiopure_tpu.utils import audio_save, audio_save_as_img
    from audiopure_tpu.utils import checkpoint as ckpt_lib

    cfg = load_config(args.config) if args.config else Config()
    net = make_wavenet(cfg.wavenet)
    if os.path.isdir(args.ckpt_path):
        tree = ckpt_lib.restore(args.ckpt_path)
        params = tree["params"] if "params" in tree else tree
        if "params" not in params:
            params = {"params": params}
    else:
        from audiopure_tpu.utils.torch_convert import \
            convert_diffwave_checkpoint
        params = convert_diffwave_checkpoint(args.ckpt_path,
                                             cfg.wavenet.num_res_layers)

    schedule = make_schedule(cfg.diffusion.T, cfg.diffusion.beta_0,
                             cfg.diffusion.beta_T)
    sampler = DDPMPurifier(lambda x, t: net.apply(params, x, t), schedule,
                           reverse_timestep=cfg.diffusion.T)

    seg = cfg.trainset.segment_length
    shape = (args.num_samples, 1, seg)
    if args.fast > 0:
        print(f"begin fast sampling with K = {args.fast} steps")

        def _fast(k):
            k0, k1 = jax.random.split(k)
            x_T = jax.random.normal(k0, shape, dtype=jnp.float32)
            return sampler.fast_reverse(x_T, k1, K=args.fast)

        from audiopure_tpu.utils.jit_utils import hoisted_jit
        sample_jit = hoisted_jit(_fast)
    else:
        print(f"begin sampling, total number of reverse steps = "
              f"{cfg.diffusion.T}")
        from audiopure_tpu.utils.jit_utils import hoisted_jit
        sample_jit = hoisted_jit(lambda k: sampler.sample(k, shape))
    sample_jit(jax.random.PRNGKey(99))[0].block_until_ready()  # compile

    t0 = time.perf_counter()
    audio = sample_jit(jax.random.PRNGKey(args.seed))
    audio.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"generated {args.num_samples} utterances in {dt:.2f}s "
          f"({dt / args.num_samples:.3f} s/utterance)")

    os.makedirs(args.output_directory, exist_ok=True)
    for i in range(args.num_samples):
        w = np.asarray(audio[i])
        audio_save(w, args.output_directory, f"sample_{i}.wav",
                   cfg.trainset.sampling_rate)
        audio_save_as_img(w, args.output_directory, f"sample_{i}.png")
    print(f"wrote {args.num_samples} wavs to {args.output_directory}")
    return dt


if __name__ == "__main__":
    main()
