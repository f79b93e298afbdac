"""Mel-spectrogram classifier training on Speech Commands.

Rebuild of ``audio_models/ConvNets_SpeechCommands/train_speech_commands.py``
(and its adversarial twin via ``--adv``, ``adv_train_speech_commands.py``;
and ``audio_models/M5/train.py`` via ``--model m5``):
STFT-domain augmentation + background noise, class-balanced weighted
sampling, SGD/Adam with plateau/step LR, optional mixup, optional in-step
waveform PGD, best-acc/best-loss checkpoints.
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
    parser.add_argument("--train_dataset", required=True)
    parser.add_argument("--valid_dataset", required=True)
    parser.add_argument("--background_noise", default=None)
    parser.add_argument("--model", default="vgg19_bn")
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--optim", choices=["sgd", "adam"], default="sgd")
    parser.add_argument("--learning_rate", type=float, default=1e-2)
    parser.add_argument("--weight_decay", type=float, default=1e-2)
    parser.add_argument("--lr_scheduler", choices=["plateau", "step"],
                        default="plateau")
    parser.add_argument("--lr_scheduler_patience", type=int, default=5)
    parser.add_argument("--lr_scheduler_step_size", type=int, default=50)
    parser.add_argument("--lr_scheduler_gamma", type=float, default=0.1)
    parser.add_argument("--max_epochs", type=int, default=70)
    parser.add_argument("--batch_size", type=int, default=96)
    parser.add_argument("--mixup", action="store_true")
    parser.add_argument("--adv", action="store_true",
                        help="adversarial training (waveform PGD)")
    parser.add_argument("--adv_eps", type=float, default=0.002)
    parser.add_argument("--adv_steps", type=int, default=10)
    parser.add_argument("--adv_ratio", type=float, default=0.5)
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sc09", action="store_true",
                        help="10-digit SC09 task instead of 12-class SC")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.data import (BackgroundNoiseDataset, DataLoader,
                                    SC09Dataset, SpeechCommandsDataset)
    from audiopure_tpu.data import transforms as T
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.training.classifier import (
        ReduceLROnPlateau, StepLR, init_classifier_state, make_eval_step,
        make_optimizer, make_train_step, set_lr)
    from audiopure_tpu.utils import checkpoint as ckpt_lib
    from audiopure_tpu.utils import logging as logger

    logger.configure(os.path.join(args.checkpoint_dir, "logs"))

    is_wave_model = args.model == "m5"
    fe = None if is_wave_model else MelFrontEnd()

    # data: waveform-level augmentation; mel happens on-device in the step
    aug = [T.LoadAudio(), T.ChangeAmplitude(),
           T.ChangeSpeedAndPitchAudio(), T.TimeshiftAudio(),
           T.FixAudioLength()]
    if args.background_noise:
        bg = BackgroundNoiseDataset(
            args.background_noise,
            transform=T.Compose([T.FixAudioLength()]))
        aug.append(T.AddBackgroundNoise(bg))
    ds_cls = SC09Dataset if args.sc09 else SpeechCommandsDataset
    train_ds = ds_cls(args.train_dataset, transform=T.Compose(aug))
    valid_ds = ds_cls(args.valid_dataset, transform=T.Compose(
        [T.LoadAudio(), T.FixAudioLength()]))
    weights = train_ds.make_weights_for_balanced_classes()
    train_loader = DataLoader(train_ds, args.batch_size, weights=weights,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_ds, args.batch_size)

    model = create_classifier(args.model, num_classes=args.num_classes)
    dummy = jnp.zeros((2, 1, 16000))
    inp = dummy if is_wave_model else fe(dummy)
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), inp)

    opt = make_optimizer(args.optim, args.learning_rate,
                         weight_decay=args.weight_decay)
    adv_cfg = None
    if args.adv:
        adv_cfg = {"eps": args.adv_eps, "alpha": args.adv_eps / 5,
                   "steps": args.adv_steps, "ratio": args.adv_ratio}
    train_step = make_train_step(model.apply, opt,
                                 mixup_alpha=0.2 if args.mixup else 0.0,
                                 adv_config=adv_cfg, transform=fe)
    eval_step = make_eval_step(model.apply, transform=fe)
    state = init_classifier_state(variables, opt,
                                  jax.random.PRNGKey(args.seed))

    plateau = ReduceLROnPlateau(args.learning_rate,
                                args.lr_scheduler_patience,
                                args.lr_scheduler_gamma)
    steplr = StepLR(args.learning_rate, args.lr_scheduler_step_size,
                    args.lr_scheduler_gamma)

    best_acc, best_loss = 0.0, np.inf
    for epoch in range(args.max_epochs):
        if args.lr_scheduler == "step":
            state = state._replace(opt_state=set_lr(
                state.opt_state, steplr.at_epoch(epoch)))
        for batch in train_loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            state, m = train_step(state, x, y)
            logger.logkv_mean("train/loss", float(m["loss"]))
            logger.logkv_mean("train/acc", float(m["acc"]))

        correct, count, vloss = 0, 0, 0.0
        for batch in valid_loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            out = eval_step(state.variables, x, y)
            correct += int(out["correct"])
            count += len(y)
            vloss += float(out["loss"]) * len(y)
        vacc, vloss = correct / count, vloss / count
        logger.logkv("epoch", epoch)
        logger.logkv("valid/acc", vacc)
        logger.logkv("valid/loss", vloss)
        logger.dumpkvs()

        if args.lr_scheduler == "plateau":
            state = state._replace(opt_state=set_lr(
                state.opt_state, plateau.step(vloss)))

        meta = dict(model_name=args.model, num_classes=args.num_classes,
                    epoch=epoch, valid_acc=vacc, valid_loss=vloss)
        if vacc > best_acc:
            best_acc = vacc
            ckpt_lib.save_model(os.path.join(
                args.checkpoint_dir, "best-acc"), state.variables, meta)
        if vloss < best_loss:
            best_loss = vloss
            ckpt_lib.save_model(os.path.join(
                args.checkpoint_dir, "best-loss"), state.variables, meta)
    print(f"done: best valid acc {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
