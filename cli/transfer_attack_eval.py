"""Transfer-attack evaluation.

Rebuild of ``transfer_attack_eval.py:1-250``: craft adversarial examples
against a *surrogate* system (the undefended classifier), then measure how
well they transfer to the defended system. Reports steal (surrogate
fooling), clean, and robust accuracies.
"""

from __future__ import annotations

import argparse

import numpy as np

from cli.adaptive_attack_eval import add_attack_args, build_attacker
from cli.common import (add_common_args, build_defender, load_classifier,
                        make_eval_sharding, make_wave2spect, pad_batch,
                        system_model_fn)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser)
    add_attack_args(parser)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.data import DataLoader, SC09Dataset
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio

    classifier, name = load_classifier(args)
    transform = None if name == "m5" else make_wave2spect(args)

    # surrogate: same classifier, NO defense (ref ``:143-170``)
    surrogate = AcousticSystem(classifier, transform, None)
    surrogate_fn = system_model_fn(surrogate)

    # victim: the defended system
    defender, defense_type, stochastic = build_defender(args)
    victim = AcousticSystem(classifier, transform, defender, defense_type,
                            defender_stochastic=stochastic)
    victim_fn = system_model_fn(victim)

    attacker = build_attacker(args, surrogate_fn)

    dataset = SC09Dataset(args.data_path, transform=Compose(
        [LoadAudio(), FixAudioLength()]),
        num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size)

    key = jax.random.PRNGKey(args.seed)
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    surrogate_jit = hoisted_jit(
        lambda x, k: jnp.argmax(surrogate_fn(x, k), -1))
    victim_jit = hoisted_jit(lambda x, k: jnp.argmax(victim_fn(x, k), -1))
    _, x_sharding, y_sharding = make_eval_sharding(args)

    stolen = correct_clean = correct_robust = total = 0
    for bi, batch in enumerate(loader):
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = jnp.asarray(batch["target"])
        x, y, n_valid = pad_batch(x, y, args.batch_size)
        if x_sharding is not None:
            x = jax.device_put(x, x_sharding)
            y = jax.device_put(y, y_sharding)
        key, k1, k2, k3 = jax.random.split(key, 4)

        pred_clean = victim_jit(x, k1)
        x_adv, success = attacker.generate(x, y, k2)
        if isinstance(success, tuple):
            success = success[0]
        pred_adv = victim_jit(x_adv, k3)

        total += n_valid
        stolen += int(np.asarray(success)[:n_valid].sum())
        correct_clean += int((pred_clean == y)[:n_valid].sum())
        correct_robust += int((pred_adv == y)[:n_valid].sum())
        print(f"batch {bi}: steal rate {100 * stolen / total:.2f}% | "
              f"clean acc {100 * correct_clean / total:.2f}% | transfer "
              f"robust acc {100 * correct_robust / total:.2f}%", flush=True)

    print(f"\non {total} examples: steal {100 * stolen / total:.4f}%, "
          f"clean {100 * correct_clean / total:.4f}%, robust "
          f"{100 * correct_robust / total:.4f}%")
    return dict(total=total, steal=stolen / total,
                acc_clean=correct_clean / total,
                acc_robust=correct_robust / total)


if __name__ == "__main__":
    main()
