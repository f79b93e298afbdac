"""Certified robustness via randomized smoothing.

Rebuild of ``certified_robustness_eval.py:1-133``: per-example Cohen
certification with a one-shot diffusion denoiser; JSON record dump.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from cli.common import (add_common_args, load_classifier,
                        load_diffwave_eps_fn, make_eval_sharding,
                        make_wave2spect, pad_batch)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser)
    c = parser.add_argument_group("certification")
    c.add_argument("--sigma", type=float, default=0.25)
    c.add_argument("--n0", type=int, default=100)
    c.add_argument("--n", type=int, default=1000)
    c.add_argument("--alpha", type=float, default=0.001)
    c.add_argument("--certify_batch", type=int, default=64)
    c.add_argument("--use_denoiser", action="store_true", default=False,
                   help="denoised smoothing (one-shot diffusion denoiser)")
    c.add_argument("--output", default="certify_records.json")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audiopure_tpu.certify import RobustCertificate
    from audiopure_tpu.data import DataLoader, SC09Dataset
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio
    from audiopure_tpu.diffusion.ddpm import DDPMPurifier
    from audiopure_tpu.diffusion.schedule import make_schedule

    classifier, name = load_classifier(args)
    transform = None if name == "m5" else make_wave2spect(args)

    denoiser = None
    if args.use_denoiser or args.ddpm_path is not None:
        eps_fn, cfg = load_diffwave_eps_fn(args)
        sched = make_schedule(cfg.diffusion.T, cfg.diffusion.beta_0,
                              cfg.diffusion.beta_T)
        denoiser = DDPMPurifier(eps_fn, sched, reverse_timestep=args.t)

    rc = RobustCertificate(classifier, transform, denoiser, num_classes=10)

    dataset = SC09Dataset(args.data_path, transform=Compose(
        [LoadAudio(), FixAudioLength()]),
        num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size)

    _, x_sharding, _ = make_eval_sharding(args)
    key = jax.random.PRNGKey(args.seed)
    records = []
    correct = abstain = total = 0
    for batch in loader:
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = np.asarray(batch["target"])
        # pad ragged final batch: the certify graph (n=100k forwards)
        # compiles once per shape, and --dp needs divisible batches
        x, y_j, n_valid = pad_batch(x, jnp.asarray(y), args.batch_size)
        y = np.asarray(y_j)[:n_valid]
        if x_sharding is not None:
            x = jax.device_put(x, x_sharding)
        key, sub = jax.random.split(key)
        res = rc.certify(x, y, sub, sigma=args.sigma, n_0=args.n0,
                         n=args.n, alpha=args.alpha,
                         batch_size=args.certify_batch)
        for i in range(len(y)):
            records.append(dict(
                path=batch["path"][i], target=int(y[i]),
                prediction=int(res.prediction[i]),
                radius=float(res.radius[i])))
        total += len(y)
        correct += int((res.prediction[:n_valid] == y).sum())
        abstain += int((res.prediction[:n_valid] == -1).sum())
        print(f"certified {total}: acc {100 * correct / total:.2f}%, "
              f"abstain {100 * abstain / total:.2f}%", flush=True)

    out = dict(sigma=args.sigma, n0=args.n0, n=args.n, alpha=args.alpha,
               records=records)
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.output}")
    return out


if __name__ == "__main__":
    main()
