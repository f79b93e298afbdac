"""Shared CLI assembly: classifiers, defenders, acoustic systems.

The reference spreads this across every entry point
(``adaptive_attack_eval.py:61-165``); here it is one builder module.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audiopure_tpu import AcousticSystem
from audiopure_tpu.config import load_config, Config
from audiopure_tpu.models import create_classifier
from audiopure_tpu.ops import MelFrontEnd
from audiopure_tpu.utils import checkpoint as ckpt_lib


def add_common_args(parser: argparse.ArgumentParser) -> None:
    """The reference's shared argument groups
    (``adaptive_attack_eval.py:15-52``)."""
    g = parser.add_argument_group("classifier")
    g.add_argument("--data_path", help="dataset folder")
    g.add_argument("--classifier_path", help="saved classifier ckpt dir")
    g.add_argument("--classifier_model", default="wideresnet28_10",
                   help="architecture name if no ckpt is given")
    g.add_argument("--classifier_input", choices=["mel32", "mel40"],
                   default="mel32")
    g.add_argument("--num_per_class", type=int, default=10)

    d = parser.add_argument_group("diffusion defense")
    d.add_argument("--ddpm_config", type=str, default=None,
                   help="JSON config (reference config.json layout)")
    d.add_argument("--ddpm_path", type=str, default=None,
                   help="diffusion ckpt: orbax dir or torch .pkl")
    d.add_argument("--sample_step", type=int, default=1)
    d.add_argument("--t", type=int, default=3)
    d.add_argument("--t_delta", type=int, default=0)
    d.add_argument("--rand_t", action="store_true", default=False)
    d.add_argument("--diffusion_type", type=str, default="sde",
                   choices=["ddpm", "sde"])
    d.add_argument("--score_type", type=str, default="guided_diffusion")
    d.add_argument("--use_bm", action="store_true", default=False)
    d.add_argument("--grad_mode", type=str, default="ref",
                   choices=["ref", "full"],
                   help="'ref' reproduces the reference's stop-grad eps-net")
    d.add_argument("--compute_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="eps-net compute dtype (bf16 for the TPU MXU)")
    d.add_argument("--conv_impl", type=str, default="xla",
                   choices=["xla", "matmul", "pallas"],
                   help="WaveNet conv path; 'pallas' = fused VMEM-resident "
                        "residual-block kernel (custom-VJP recompute "
                        "backward when --grad_mode full)")
    d.add_argument("--unet_conv", type=str, default="xla",
                   choices=["xla", "pallas", "pallas_fused"],
                   help="DiffSpec UNet 3x3 conv path; 'pallas' = fused "
                        "flat-tap kernel (kernels/unet_conv.py), same "
                        "param tree")

    v = parser.add_argument_group("device/saving")
    v.add_argument("--batch_size", type=int, default=10)
    v.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for eval: shard each batch "
                        "over a dp-device mesh (-1 = all devices). Replaces "
                        "the reference's DistributedSampler/NCCL eval path "
                        "(DiffWave_Unconditional/distributed_util.py:97-149)")
    v.add_argument("--seed", type=int, default=0)
    v.add_argument("--save_path", default=None)
    v.add_argument("--verbose", type=int, default=0)


def make_eval_sharding(args):
    """Build the --dp eval mesh: returns ``(mesh, x_sharding, y_sharding)``
    or ``(None, None, None)`` for single-device eval.

    Inputs ``device_put`` with these shardings make every downstream jit
    (purify, classify, the whole attack loop) run batch-parallel over the
    mesh — XLA inserts any cross-chip collectives; no code inside the
    system/attacks changes."""
    dp = getattr(args, "dp", 1)
    if dp in (0, 1):
        return None, None, None
    from audiopure_tpu.parallel import batch_sharding, make_mesh

    devices = jax.devices()
    if dp == -1:
        dp = len(devices)
    if dp > len(devices):
        raise SystemExit(f"--dp {dp} > available devices ({len(devices)})")
    if args.batch_size % dp:
        raise SystemExit(
            f"--batch_size {args.batch_size} not divisible by --dp {dp}")
    mesh = make_mesh(devices[:dp], dp=dp, tp=1)
    print(f"eval mesh: dp={dp} over {devices[0].platform}")
    return mesh, batch_sharding(mesh, ndim=3), batch_sharding(mesh, ndim=1)


def pad_batch(x, y, batch_size: int):
    """Pad a ragged final batch up to ``batch_size`` by repeating the last
    example; returns ``(x, y, n_valid)``.  Keeps every compiled program at
    one batch shape (no ragged-batch recompile) and keeps the batch
    divisible by --dp; callers must slice accounting to ``n_valid``."""
    n = int(x.shape[0])
    if n == batch_size:
        return x, y, n
    reps = batch_size - n
    x = jnp.concatenate([x, jnp.repeat(x[-1:], reps, axis=0)], axis=0)
    y = jnp.concatenate([y, jnp.repeat(y[-1:], reps, axis=0)], axis=0)
    return x, y, n


def load_classifier(args, num_classes: int = 10):
    """Build (and optionally restore) a classifier; returns
    (callable spec->logits, model_name)."""
    if args.classifier_path:
        variables, meta = ckpt_lib.load_model(args.classifier_path)
        name = meta["model_name"]
        num_classes = meta.get("num_classes", num_classes)
        model = create_classifier(name, num_classes=num_classes)
    else:
        name = args.classifier_model
        model = create_classifier(name, num_classes=num_classes)
        n_mels = 40 if args.classifier_input == "mel40" else 32
        dummy = jnp.zeros((1, 1, 16000)) if name == "m5" \
            else jnp.zeros((1, 1, n_mels, 32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
        print(f"WARNING: no --classifier_path; using random-init {name}")
    return (lambda x: model.apply(variables, x)), name


def make_wave2spect(args):
    n_mels = 40 if args.classifier_input == "mel40" else 32
    return MelFrontEnd(n_mels=n_mels)


def pallas_forward_fn(grad_mode: str):
    """Pick the fused-kernel WaveNet forward for the eps-net.

    ``grad_mode='full'`` differentiates *through* the eps-net, so it gets
    the custom-VJP wrapper (pallas forward, recompute backward —
    ``kernels/wavenet_block_grad.py``); ``'ref'`` reproduces the
    reference's stop-grad contract (``diffwave_ddpm.py:166``) and uses the
    forward-only kernel."""
    if grad_mode == "full":
        from audiopure_tpu.kernels.wavenet_block_grad import \
            wavenet_forward_pallas_grad
        from audiopure_tpu.kernels.wavenet_stack_grad import \
            wavenet_forward_pallas_input_grad

        def fwd(params, x, t, **kw):
            # the attack differentiates w.r.t. the WAVEFORM only, so the
            # whole-net input-grad VJP (layer-resident backward) applies
            # whenever the layer count fills whole dilation cycles; the
            # per-layer VJP (weight grads too) remains the fallback
            kw.pop("tile_l", None)
            nl = kw.get("num_res_layers", 36)
            cyc = kw.get("dilation_cycle", 12)
            if nl % cyc == 0:
                return wavenet_forward_pallas_input_grad(params, x, t,
                                                         **kw)
            return wavenet_forward_pallas_grad(params, x, t, **kw)

        return fwd
    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    return wavenet_forward_pallas


def load_diffwave_eps_fn(args):
    """Build the DiffWave eps-net from an orbax dir or torch .pkl ckpt."""
    import dataclasses

    from audiopure_tpu.models.wavenet import make_wavenet

    cfg = load_config(args.ddpm_config) if args.ddpm_config else Config()
    dtype = jnp.bfloat16 if getattr(args, "compute_dtype",
                                    "f32") == "bf16" else jnp.float32
    conv_impl = getattr(args, "conv_impl", "xla")
    net = make_wavenet(cfg.wavenet)
    net = dataclasses.replace(
        net, dtype=dtype,
        conv_impl=conv_impl if conv_impl != "pallas" else "xla")
    if args.ddpm_path and os.path.isdir(args.ddpm_path):
        with_meta = os.path.exists(os.path.join(args.ddpm_path,
                                                "meta.json"))
        if with_meta:
            params, _ = ckpt_lib.load_model(args.ddpm_path)
        else:
            params = ckpt_lib.restore(args.ddpm_path)
            params = params.get("params", params)
            if "params" not in params:
                params = {"params": params}
    elif args.ddpm_path:  # torch pickle
        from audiopure_tpu.utils.torch_convert import \
            convert_diffwave_checkpoint
        params = convert_diffwave_checkpoint(
            args.ddpm_path, cfg.wavenet.num_res_layers)
    else:
        x0 = jnp.zeros((1, 1, 16000))
        params = net.init(jax.random.PRNGKey(0), x0, jnp.zeros((1, 1)))
        print("WARNING: no --ddpm_path; using random-init DiffWave")

    if conv_impl == "pallas" and jax.default_backend() not in ("tpu",
                                                                "axon"):
        print("WARNING: --conv_impl pallas needs a TPU backend; "
              "falling back to xla")
        conv_impl = "xla"
    if conv_impl == "pallas":
        w = cfg.wavenet
        grad_mode = getattr(args, "grad_mode", "ref")
        fwd = pallas_forward_fn(grad_mode)
        extra = {}
        if grad_mode == "ref" and getattr(args, "gate_f32", False):
            # a 'ref' prediction system paired with a grad_mode='full'
            # attack must match the VJP primal's f32 gates, not the v6
            # bf16-gate default (~4e-3 rel difference; advisor r2)
            extra["gate_dtype"] = jnp.float32
        return (lambda x, t: fwd(
            params, x, t, num_res_layers=w.num_res_layers,
            dilation_cycle=w.dilation_cycle,
            embed_dim_in=w.diffusion_step_embed_dim_in,
            dtype=dtype, **extra).astype(jnp.float32)), cfg
    return (lambda x, t: net.apply(params, x, t)), cfg


def build_defender(args, audio_length: int = 16000):
    """Defense dispatcher (ref ``adaptive_attack_eval.py:97-127``).
    Returns (defender, defense_type, stochastic)."""
    name = args.defense
    if name == "None":
        return None, "wave", False
    if name == "Diffusion":
        from audiopure_tpu.diffusion.ddpm import DDPMPurifier
        from audiopure_tpu.diffusion.vpsde import RevDiffWave
        from audiopure_tpu.diffusion.schedule import make_schedule

        eps_fn, cfg = load_diffwave_eps_fn(args)
        if args.diffusion_type == "sde":
            defender = RevDiffWave(
                eps_fn, T=cfg.diffusion.T, t=args.t,
                sample_step=args.sample_step, beta_0=cfg.diffusion.beta_0,
                beta_T=cfg.diffusion.beta_T, grad_mode=args.grad_mode,
                rand_t=args.rand_t, t_delta=args.t_delta)
        else:
            sched = make_schedule(cfg.diffusion.T, cfg.diffusion.beta_0,
                                  cfg.diffusion.beta_T)
            defender = DDPMPurifier(
                eps_fn, sched, reverse_timestep=args.t,
                stop_score_grad=(args.grad_mode == "ref"))
        return defender, "wave", True
    if name == "DiffSpec":
        from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
        from audiopure_tpu.models.unet import create_unet

        spec_dtype = jnp.bfloat16 if getattr(args, "compute_dtype",
                                             "f32") == "bf16" \
            else jnp.float32
        # UNet attention stays on the XLA einsum path pending a valid
        # on-chip A/B of the fused pallas kernel (the first A/B timed
        # interpret mode — docs/BENCH.md round 3e/3k); library option:
        # create_unet(attn_impl='pallas'). 3x3 convs route through the
        # fused pallas conv (--unet_conv pallas) once the round-3n A/B
        # justifies a default flip; both impls share one param tree.
        unet_conv = getattr(args, "unet_conv", "xla")
        if unet_conv != "xla" and jax.default_backend() not in (
                "tpu", "axon"):
            print(f"WARNING: --unet_conv {unet_conv} needs a TPU "
                  "backend; using xla")
            unet_conv = "xla"
        net = create_unet(dtype=spec_dtype, conv_impl=unet_conv)
        if args.ddpm_path:
            params, _ = ckpt_lib.load_model(args.ddpm_path)
        else:
            x0 = jnp.zeros((1, 1, 32, 32))
            params = jax.jit(net.init)(jax.random.PRNGKey(0), x0,
                                       jnp.zeros((1,)))
            print("WARNING: no --ddpm_path; using random-init UNet")
        eps_fn = lambda x, t: net.apply(params, x, t.reshape(-1)).astype(
            jnp.float32)
        defender = RevSpecDiffusion(eps_fn, t=args.t,
                                    sample_step=args.sample_step,
                                    grad_mode=args.grad_mode,
                                    rand_t=getattr(args, "rand_t", False),
                                    t_delta=getattr(args, "t_delta", 0))
        return defender, "spec", True
    if name in ("AT", "AS", "MS", "QT", "BDR"):
        from audiopure_tpu.defenses import TimeDomainDefense
        return TimeDomainDefense(name), "wave", name == "AT"
    if name in ("DS", "LPF", "BPF"):
        from audiopure_tpu.defenses import FreqDomainDefense
        return FreqDomainDefense(name), "wave", False
    raise NotImplementedError(f"Unknown defense: {name}!")


def build_system(args, num_classes: int = 10):
    classifier, name = load_classifier(args, num_classes)
    transform = None if name == "m5" else make_wave2spect(args)
    defender, defense_type, stochastic = build_defender(args)
    system = AcousticSystem(classifier, transform, defender, defense_type,
                            defender_stochastic=stochastic)
    print(f"classifier model: {name}")
    print(f"defense: {args.defense}"
          + (f" with t={args.t}" if args.defense == "Diffusion" else ""))
    return system


def system_model_fn(system: AcousticSystem):
    """(x, key) -> logits closure; AcousticSystem routes the key only to
    stochastic defenders, so one shape fits all configurations."""
    return lambda x, key: system(x, key=key)
