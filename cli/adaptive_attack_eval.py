"""Adaptive-attack robust-accuracy evaluation on SC09.

Rebuild of the flagship entry point ``adaptive_attack_eval.py:13-291``:
clean / purified-clean / robust accuracy of an AcousticSystem under
white-box EOT-PGD, black-box FAKEBOB, or Kenansville attacks.

TPU-first: the per-batch work — purification, the whole PGD/NES loop, the
EOT axis — is one jitted program per configuration; batches stream through
the prefetching loader.

Usage:
  python -m cli.adaptive_attack_eval --data_path <sc09> \
      --classifier_path <ckpt> --defense Diffusion --ddpm_path <ckpt> \
      --attack PGD --eps 0.002 --max_iter_1 70 \
      --eot_attack_size 15 --eot_defense_size 15
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cli.common import (add_common_args, build_system, make_eval_sharding,
                        pad_batch, system_model_fn)


def add_attack_args(parser):
    a = parser.add_argument_group("attack")
    a.add_argument("--attack", type=str, default="PGD",
                   choices=["PGD", "FAKEBOB", "Square", "SPSA", "Siren",
                            "KenansvilleFFT", "KenansvilleSSA",
                            "CleanOnly"])
    a.add_argument("--defense", type=str, default="None",
                   choices=["Diffusion", "DiffSpec", "AT", "AS", "MS",
                            "QT", "BDR", "DS", "LPF", "BPF", "None"])
    a.add_argument("--bound_norm", type=str, default="linf",
                   choices=["linf", "l2"])
    a.add_argument("--eps", type=float, default=0.002)
    a.add_argument("--max_iter_1", type=int, default=70,
                   help="stage-1 iterations (PGD); also the Square/SPSA "
                        "iteration budget")
    a.add_argument("--max_iter_2", type=int, default=0)
    a.add_argument("--masker_ref_quirks", action="store_true",
                   help="stage-2 masker reproduces the reference's "
                        "bark-filter quirks exactly (docs/PARITY.md) "
                        "instead of the fixed frequency-bin indexing")
    a.add_argument("--eot_attack_size", type=int, default=1)
    a.add_argument("--eot_defense_size", type=int, default=1)
    a.add_argument("--eot_batch_size", type=int, default=None,
                   help="replicas per compiled chunk (the reference's "
                        "EOT_batch_size memory knob, _EOT.py:21)")
    a.add_argument("--share_eot", action="store_true",
                   help="reuse the gradient pass's EOT forward scores "
                        "for the prediction bookkeeping (same point, "
                        "same replica count; ~2x fewer purifications "
                        "per PGD iteration; needs equal EOT sizes)")
    a.add_argument("--pair_mode", type=str, default="auto",
                   choices=["auto", "two_pass", "fused"],
                   help="schedule for the exact reference pairing "
                        "(independent defense + attack EOT stacks per "
                        "iteration): 'fused' runs both stacks as one "
                        "2R-replica dispatch (EOT.paired), 'two_pass' "
                        "sequentially; estimator-identical (same keys "
                        "reproduce the same trajectory). 'auto' picks "
                        "by measurement: fused for DiffSpec (the b8 "
                        "UNet is not batch-saturated, +8%% — BENCH.md "
                        "round 4d), two_pass for the waveform path "
                        "(saturated; fused is a null, round 4a). "
                        "Ignored under --share_eot.")
    a.add_argument("--pair_fused", action="store_true",
                   help="deprecated alias for --pair_mode fused")
    a.add_argument("--segment_iters", type=int, default=10,
                   help="run the PGD scan as dispatches of this many "
                        "iterations with the carry passed between them "
                        "(0 = one monolithic program). Trajectory-"
                        "identical (same keys/body; test-pinned); keeps "
                        "single dispatches under the remote TPU "
                        "runtime's ~60 s execution watchdog at the "
                        "reference 70-iteration config")
    a.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of the first "
                        "attacked batch (view in TensorBoard/XProf)")


def _resolve_pair_fused(args) -> bool:
    """Pick the pairing schedule (see ``--pair_mode``). Measurement-backed
    defaults: DiffSpec's batch-8 UNet gains ~8% from fusing the two EOT
    stacks into one 2R-replica dispatch (BENCH.md round 4d); the waveform
    path is batch-saturated and fusing is a null result (round 4a)."""
    if getattr(args, "share_eot", False):
        return False  # share_eot removes the second stack entirely
    if getattr(args, "pair_fused", False):
        return True
    mode = getattr(args, "pair_mode", "auto")
    if mode == "auto":
        # pair_fused requires equal EOT sizes (one 2R dispatch)
        return (getattr(args, "defense", None) == "DiffSpec"
                and getattr(args, "eot_attack_size", 1)
                == getattr(args, "eot_defense_size", 1))
    return mode == "fused"


def build_attacker(args, model_fn, predict_model_fn=None):
    if args.attack == "PGD":
        from audiopure_tpu.attacks import AudioAttack
        from audiopure_tpu.attacks.masker import PsychoacousticMasker

        atk = AudioAttack(
            model_fn, eps=args.eps, norm=args.bound_norm,
            max_iter_1=args.max_iter_1, max_iter_2=args.max_iter_2,
            learning_rate_1=(args.eps / 5 if args.bound_norm == "linf"
                             else args.eps / 2),
            eot_attack_size=args.eot_attack_size,
            eot_defense_size=args.eot_defense_size,
            eot_chunk=args.eot_batch_size,
            masker=PsychoacousticMasker(
                ref_quirks=getattr(args, "masker_ref_quirks", False))
            if args.max_iter_2 > 0 else None,
            predict_model_fn=predict_model_fn,
            share_eot=getattr(args, "share_eot", False),
            pair_fused=_resolve_pair_fused(args),
            segment_iters=getattr(args, "segment_iters", 0))
        print(f"attack: PGD with {args.bound_norm}_eps={args.eps} & "
              f"iter={args.max_iter_1} & "
              f"eot={args.eot_attack_size}-{args.eot_defense_size}\n")
        return atk
    if args.attack == "FAKEBOB":
        from audiopure_tpu.attacks.fakebob import FAKEBOB

        atk = FAKEBOB(model_fn, task="SCR", targeted=False,
                      confidence=0.5, epsilon=args.eps, max_iter=200,
                      samples_per_draw=200,
                      samples_per_draw_batch_size=50)
        print(f"attack: FAKEBOB with eps={args.eps} & confidence=0.5 & "
              f"iter=200 & samples_per_draw=200\n")
        return atk
    if args.attack == "Square":
        from audiopure_tpu.attacks.square import SquareAttack

        # --max_iter_1 is respected as-is (no silent floor); the upstream
        # SquareAttack default is 100 — pass a higher value for parity
        print(f"attack: Square with eps={args.eps} & "
              f"iters={args.max_iter_1}\n")
        return SquareAttack(model_fn, eps=args.eps,
                            n_iters=args.max_iter_1)
    if args.attack == "SPSA":
        from audiopure_tpu.attacks.spsa import LinfSPSA

        print(f"attack: LinfSPSA with eps={args.eps} & "
              f"iters={args.max_iter_1}\n")
        return LinfSPSA(model_fn, eps=args.eps,
                        n_iters=args.max_iter_1)
    if args.attack == "Siren":
        from audiopure_tpu.attacks.siren import SirenAttack

        # reference defaults max_epoch=300/max_iter=30; scale the PSO
        # budget from --max_iter_1 (epochs) like the other black-boxes
        print(f"attack: Siren (PSO) with eps={args.eps} & "
              f"epochs={args.max_iter_1} & iters=30 & particles=25\n")
        return SirenAttack(model_fn, epsilon=args.eps,
                           max_epoch=args.max_iter_1, max_iter=30)
    if args.attack.startswith("Kenansville"):
        from audiopure_tpu.attacks.kenansville import KenansvilleAttack

        method = "fft" if args.attack.endswith("FFT") else "ssa"
        return KenansvilleAttack(model_fn, method=method, max_iter=15)
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser)
    add_attack_args(parser)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audiopure_tpu.data import DataLoader, SC09Dataset
    from audiopure_tpu.data.transforms import (Compose, FixAudioLength,
                                               LoadAudio)
    from audiopure_tpu import utils as ap_utils

    system = build_system(args)
    model_fn = system_model_fn(system)
    # grad_mode='full' routes the eps-net through the custom-VJP grad
    # kernel; the attack's *prediction* pass never differentiates, so
    # build a grad_mode='ref' system (forward-only fused kernel) for it —
    # same weights, f32 gates forced so its values match the VJP primal
    # exactly (the v6 bf16-gate default differs by ~4e-3 relative)
    predict_fn = None
    if getattr(args, "grad_mode", "ref") == "full" \
            and args.attack == "PGD" \
            and args.defense in ("Diffusion", "DiffSpec"):
        import copy
        ref_args = copy.copy(args)
        ref_args.grad_mode = "ref"
        ref_args.gate_f32 = True
        predict_fn = system_model_fn(build_system(ref_args))
    attacker = build_attacker(args, model_fn, predict_fn)
    _, x_sharding, y_sharding = make_eval_sharding(args)

    dataset = SC09Dataset(
        folder=args.data_path,
        transform=Compose([LoadAudio(), FixAudioLength()]),
        num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False)

    from audiopure_tpu.utils.jit_utils import hoisted_jit

    predict_clean = hoisted_jit(lambda x: jnp.argmax(
        system(x, defend=False), -1))
    purify = hoisted_jit(lambda x, k: system.defender(x, k)
                         if system.defender_stochastic
                         else system.defender(x)) \
        if system.defender is not None else None

    key = jax.random.PRNGKey(args.seed)
    correct_orig = correct_denoised = correct_adv = total = 0

    for bi, batch in enumerate(loader):
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = jnp.asarray(batch["target"])
        # pad ragged final batch: one compiled shape, --dp divisibility
        x, y, n_valid = pad_batch(x, y, args.batch_size)
        if x_sharding is not None:
            x = jax.device_put(x, x_sharding)
            y = jax.device_put(y, y_sharding)
        key, k1, k2, k3 = jax.random.split(key, 4)

        pred_clean = predict_clean(x)

        if system.defender is not None and system.defense_type == "wave":
            x_def = purify(x, k1)[: x.shape[0]]
            pred_def = predict_clean(x_def)
        elif system.defender is not None:  # spec defense
            pred_def = jnp.argmax(model_fn(x, k1), -1)
        else:
            pred_def = pred_clean

        if attacker is None:
            success = jnp.zeros_like(y, dtype=bool)
            x_adv = x
        else:
            if args.profile_dir and bi == 0:
                from audiopure_tpu.utils.profiling import trace

                with trace(args.profile_dir):
                    x_adv, success = attacker.generate(x, y, k2)
                    jax.block_until_ready(x_adv)
                print(f"wrote device trace to {args.profile_dir}")
            else:
                x_adv, success = attacker.generate(x, y, k2)
            if isinstance(success, tuple):
                success = success[0]

        if args.save_path:
            clean_path = os.path.join(args.save_path, "clean")
            adv_path = os.path.join(args.save_path, "adv")
            for i in range(n_valid):
                audio_id = str(total + i).zfill(3)
                t_i = int(y[i])
                ap_utils.audio_save(
                    np.asarray(x[i]), clean_path,
                    f"{audio_id}_{t_i}_clean.wav")
                ap_utils.audio_save(
                    np.asarray(x_adv[i]), adv_path,
                    f"{audio_id}_{t_i}_adv.wav")

        total += n_valid
        correct_orig += int((pred_clean == y)[:n_valid].sum())
        correct_denoised += int((pred_def == y)[:n_valid].sum())
        correct_adv += int(n_valid - np.asarray(success)[:n_valid].sum())
        print(f"batch {bi}: orig clean acc {100 * correct_orig / total:.4f}%"
              f" | denoised clean acc "
              f"{100 * correct_denoised / total:.4f}%"
              f" | {args.attack} robust acc "
              f"{100 * correct_adv / total:.4f}%", flush=True)

    print(f"\non {total} test examples:")
    print(f"original clean test accuracy: "
          f"{100 * correct_orig / total:.4f}%")
    print(f"denoised clean test accuracy: "
          f"{100 * correct_denoised / total:.4f}%")
    print(f"{args.attack} robust test accuracy: "
          f"{100 * correct_adv / total:.4f}%")
    return dict(total=total, acc_orig=correct_orig / total,
                acc_denoised=correct_denoised / total,
                acc_robust=correct_adv / total)


if __name__ == "__main__":
    main()
