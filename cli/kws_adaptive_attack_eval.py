"""Adaptive-attack robust accuracy on the Qualcomm keyword set.

Rebuild of ``kws_adaptive_attack_eval.py:1-289``: same harness as the SC09
eval but with the RCNN KWSModel on variable-length audio. The reference
mutates ``defender.rev_vpsde.audio_shape`` per batch (``:178``); here the
purifier is shape-polymorphic (jit re-specializes per bucket length) and
``--buckets N`` batches variable-length audio into N static lengths
(``BucketedDataLoader``) so the whole eval compiles at most N programs.
"""

from __future__ import annotations

import argparse

import numpy as np

from cli.adaptive_attack_eval import add_attack_args, build_attacker
from cli.common import (add_common_args, build_defender, make_eval_sharding,
                        pad_batch, system_model_fn)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser)
    add_attack_args(parser)
    parser.add_argument("--split", default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument(
        "--buckets", type=int, default=0,
        help="if >0, batch variable-length audio into this many "
             "static-length buckets (at most that many XLA compiles) "
             "instead of fixing every utterance to 2.0 s")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.data import (BucketedDataLoader, DataLoader,
                                    QualcommKeywordSpottingDataset)
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils import checkpoint as ckpt_lib

    # KWS classifier: 40-mel front-end + RCNN (ref ``model.py:66-114``)
    fe = MelFrontEnd(n_mels=40)
    model = create_classifier("kwsmodel", num_classes=4)
    if args.classifier_path:
        variables, _ = ckpt_lib.load_model(args.classifier_path)
    else:
        dummy = fe(jnp.zeros((1, 1, 16000)))
        variables = model.init(jax.random.PRNGKey(0), dummy)
        print("WARNING: random-init KWSModel")
    classifier = lambda s: model.apply(variables, s)

    defender, defense_type, stochastic = build_defender(args)
    system = AcousticSystem(classifier, fe, defender, defense_type,
                            defender_stochastic=stochastic)
    model_fn = system_model_fn(system)
    attacker = build_attacker(args, model_fn)

    if args.buckets > 0:
        dataset = QualcommKeywordSpottingDataset(
            args.data_path, transform=Compose([LoadAudio()]),
            split=args.split)
        loader = BucketedDataLoader(dataset, batch_size=args.batch_size,
                                    n_buckets=args.buckets)
    else:
        dataset = QualcommKeywordSpottingDataset(
            args.data_path,
            transform=Compose([LoadAudio(), FixAudioLength(time=2.0)]),
            split=args.split)
        loader = DataLoader(dataset, batch_size=args.batch_size)

    from audiopure_tpu.utils.jit_utils import hoisted_jit

    predict_clean = hoisted_jit(lambda x: jnp.argmax(
        system(x, defend=False), -1))
    _, x_sharding, y_sharding = make_eval_sharding(args)
    key = jax.random.PRNGKey(args.seed)
    correct_orig = correct_def = correct_adv = total = 0
    for bi, batch in enumerate(loader):
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = jnp.asarray(batch["target"])
        x, y, n_valid = pad_batch(x, y, args.batch_size)
        if x_sharding is not None:
            x = jax.device_put(x, x_sharding)
            y = jax.device_put(y, y_sharding)
        key, k1, k2 = jax.random.split(key, 3)

        pred_clean = predict_clean(x)
        pred_def = jnp.argmax(model_fn(x, k1), -1)
        if attacker is None:
            success = jnp.zeros_like(y, dtype=bool)
        else:
            _, success = attacker.generate(x, y, k2)
            if isinstance(success, tuple):
                success = success[0]

        total += n_valid
        correct_orig += int((pred_clean == y)[:n_valid].sum())
        correct_def += int((pred_def == y)[:n_valid].sum())
        correct_adv += int(n_valid - np.asarray(success)[:n_valid].sum())
        print(f"batch {bi}: clean {100 * correct_orig / total:.2f}% | "
              f"defended {100 * correct_def / total:.2f}% | robust "
              f"{100 * correct_adv / total:.2f}%", flush=True)

    print(f"\non {total} examples: clean "
          f"{100 * correct_orig / total:.4f}%, defended "
          f"{100 * correct_def / total:.4f}%, robust "
          f"{100 * correct_adv / total:.4f}%")
    return dict(total=total, acc_orig=correct_orig / total,
                acc_denoised=correct_def / total,
                acc_robust=correct_adv / total)


if __name__ == "__main__":
    main()
