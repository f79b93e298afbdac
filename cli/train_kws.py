"""Adversarial training of the RCNN keyword spotter.

Rebuild of ``audio_models/RCNN_KWS/train.py:84-245``: waveform PGD on every
batch (through the 40-mel front-end), random-length batches via the QKWS
collate, best clean/robust checkpoints.
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
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--max_epochs", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--adv_eps", type=float, default=0.002)
    parser.add_argument("--adv_steps", type=int, default=7)
    parser.add_argument("--checkpoint_dir", default="kws_checkpoints")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.data import (DataLoader,
                                    QualcommKeywordSpottingDataset)
    from audiopure_tpu.data.loader import rand_audio_length_collate
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.training.classifier import (
        init_classifier_state, make_eval_step, make_optimizer,
        make_train_step)
    from audiopure_tpu.utils import checkpoint as ckpt_lib
    from audiopure_tpu.utils import logging as logger

    logger.configure(os.path.join(args.checkpoint_dir, "logs"))
    fe = MelFrontEnd(n_mels=40)

    train_ds = QualcommKeywordSpottingDataset(
        args.data_path, transform=Compose([LoadAudio()]), split="train")
    valid_ds = QualcommKeywordSpottingDataset(
        args.data_path,
        transform=Compose([LoadAudio(), FixAudioLength(time=2.0)]),
        split="valid")
    collate = rand_audio_length_collate(
        rng=np.random.default_rng(args.seed))
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, collate_fn=collate,
                              seed=args.seed)
    valid_loader = DataLoader(valid_ds, args.batch_size)

    model = create_classifier("kwsmodel", num_classes=4)
    dummy = fe(jnp.zeros((2, 1, 32000)))
    variables = model.init(jax.random.PRNGKey(args.seed), dummy)

    opt = make_optimizer("adam", args.learning_rate)
    train_step = make_train_step(
        model.apply, opt, transform=fe,
        adv_config={"eps": args.adv_eps, "alpha": args.adv_eps / 5,
                    "steps": args.adv_steps, "ratio": 1.0})
    eval_step = make_eval_step(model.apply, transform=fe)
    state = init_classifier_state(variables, opt,
                                  jax.random.PRNGKey(args.seed))

    best_acc = 0.0
    for epoch in range(args.max_epochs):
        for batch in train_loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            state, m = train_step(state, x, y)
            logger.logkv_mean("train/loss", float(m["loss"]))
            logger.logkv_mean("train/acc", float(m["acc"]))
        correct = count = 0
        for batch in valid_loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            out = eval_step(state.variables, x, y)
            correct += int(out["correct"])
            count += len(y)
        vacc = correct / max(count, 1)
        logger.logkv("epoch", epoch)
        logger.logkv("valid/acc", vacc)
        logger.dumpkvs()
        if vacc > best_acc:
            best_acc = vacc
            ckpt_lib.save_model(
                os.path.join(args.checkpoint_dir, "best"),
                state.variables,
                dict(model_name="kwsmodel", num_classes=4, epoch=epoch,
                     valid_acc=vacc))
    print(f"done: best valid acc {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
