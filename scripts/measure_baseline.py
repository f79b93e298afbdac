"""Measured reference baseline on shared silicon (this host's CPU).

BASELINE.md requires baselines to be *measured*, not estimated. No A100
exists in this container, but the PyTorch reference itself runs on CPU —
so this script pins three measured datapoints that ground bench.py's
``vs_baseline`` methodology:

1. **Purify wall-clock on identical silicon**: the full-size 36x256
   DiffWave VP-SDE purification (t=3, L=16000, B=1) timed in the
   reference's torch-eager loop vs this framework's jitted XLA-CPU
   program, same machine, same weights.  The torch/XLA ratio measured
   here replaces the 'granted MFU' hand-wave: it shows what the eager
   per-step reference pipeline actually achieves relative to a compiled
   XLA program on shared hardware.
2. **Full-scale purified-output parity**: identical converted weights +
   bit-identical injected noise through both Euler loops at the real
   model size -> max|diff| of the purified waveforms (the north star's
   'within float tolerance' clause, at full scale rather than the tiny
   test config).
3. **Robust-accuracy parity** (BASELINE configs[1]-style): deterministic
   PGD (EOT=1) on a shared M5 classifier over a small tone set — robust
   accuracy must agree exactly between the reference attack loop and
   ours.

Writes docs/baseline_measured.json and prints a summary.  Run on CPU:
the TPU grant is exclusive and this is a torch-vs-XLA *CPU* comparison.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "docs", "baseline_measured.json")

B, L, T, T_STAR = 1, 16000, 200, 3


def _stub(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m


def setup_reference():
    import torch
    _stub("torchsde")
    _stub("torchaudio")
    _stub("torchaudio.datasets")
    _stub("torchaudio.datasets.utils", download_url=None,
          extract_archive=None)
    _stub("torchvision", datasets=None, models=None, transforms=None)
    _stub("librosa")
    if REF not in sys.path:
        sys.path.append(REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.set_num_threads(os.cpu_count() or 1)


def build_pair():
    """Full-size reference WaveNet + converted flax params + both SDEs."""
    import torch

    from diffusion_models.DiffWave_Unconditional.WaveNet import \
        WaveNet_Speech_Commands
    from diffusion_models.DiffWave_Unconditional.util import \
        calc_diffusion_hyperparams
    from diffusion_models.diffwave_ddpm import DiffWave as RefDiffWave
    from diffusion_models.diffwave_sde import RevVPSDE as RefRevVPSDE

    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.utils.torch_convert import convert_diffwave

    print("building full-size (36 x 256) WaveNet pair ...", flush=True)
    torch.manual_seed(0)
    tnet = WaveNet_Speech_Commands(
        in_channels=1, res_channels=256, skip_channels=256, out_channels=1,
        num_res_layers=36, dilation_cycle=12,
        diffusion_step_embed_dim_in=128, diffusion_step_embed_dim_mid=512,
        diffusion_step_embed_dim_out=512).eval()
    # re-init the zero-initialized output head: otherwise the eps-net
    # output is identically zero at random init and the parity check
    # would not exercise the network
    with torch.no_grad():
        for p in tnet.parameters():
            if p.numel() and bool((p == 0).all()):
                p.normal_(0, 0.05)
    params = convert_diffwave(tnet.state_dict(), num_res_layers=36)
    jnet = WaveNet()  # full default config matches the above

    dh = calc_diffusion_hyperparams(T, 1e-4, 0.02)
    wrapper = RefDiffWave(tnet, dh, reverse_timestep=T)
    rsde = RefRevVPSDE(model=wrapper, score_type="guided_diffusion",
                       beta_min=1e-4 * T, beta_max=0.02 * T, N=T,
                       audio_shape=(1, L))
    return tnet, jnet, params, rsde


def ref_purify(rsde, x0, e, zs):
    """The reference purify loop (diffwave_sde.py:183-205) with injected
    noise: q-jump then t* Euler steps of dt=1/T over the ref's f/g."""
    import numpy as np
    import torch

    abar = (1 - rsde.discrete_betas).cumprod(dim=0)
    x = (torch.from_numpy(x0) * abar[T_STAR - 1].sqrt()
         + torch.from_numpy(e) * (1.0 - abar[T_STAR - 1]).sqrt())
    dt = 1.0 / T
    t0 = 1.0 - T_STAR / T - 1e-5
    with torch.no_grad():
        for k in range(T_STAR):
            tau = torch.tensor(t0 + k * dt, dtype=torch.float32)
            xf = x.reshape(B, -1)
            drift = rsde.f(tau, xf)
            diff = rsde.g(tau, xf)
            z = torch.from_numpy(zs[k]).reshape(B, -1)
            x = (xf + drift * dt + diff * float(np.sqrt(dt)) * z
                 ).reshape(B, 1, L)
    return x.numpy()


def main():
    setup_reference()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from audiopure_tpu.diffusion.vpsde import RevDiffWave

    tnet, jnet, params, rsde = build_pair()
    eps_fn = lambda xx, tt: jnet.apply(params, xx, tt)
    purifier = RevDiffWave(eps_fn, T=T, t=T_STAR, remat=False)

    rng = np.random.RandomState(0)
    x0 = (rng.randn(B, 1, L) * 0.2).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # reproduce purify_once's PRNG layout so both loops see identical noise
    k_noise, k_sde, _ = jax.random.split(key, 3)
    e = np.asarray(jax.random.normal(k_noise, x0.shape, dtype=jnp.float32))
    zs = [np.asarray(jax.random.normal(kk, x0.shape, dtype=jnp.float32))
          for kk in jax.random.split(k_sde, T_STAR)]

    # --- 1. wall-clock, identical silicon --------------------------------
    print("timing reference torch-eager purify (CPU) ...", flush=True)
    t0 = time.perf_counter()
    want = ref_purify(rsde, x0, e, zs)
    torch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_purify(rsde, x0, e, zs)
    torch_s = min(torch_s, time.perf_counter() - t0)

    print("compiling + timing XLA-CPU purify ...", flush=True)
    purify = jax.jit(lambda xx, kk: purifier(xx, kk))
    got = np.asarray(purify(jnp.asarray(x0), key))  # compile + run
    t0 = time.perf_counter()
    got = np.asarray(purify(jnp.asarray(x0), key))
    xla_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(purify(jnp.asarray(x0), key))
    xla_s = min(xla_s, time.perf_counter() - t0)

    # --- 2. full-scale output parity --------------------------------------
    max_abs = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want)))
    print(f"purified-output max|diff| = {max_abs:.3e} "
          f"(signal max |x| = {scale:.3f})", flush=True)

    # --- 3. robust-acc parity (deterministic PGD on shared M5) -----------
    print("robust-accuracy parity (PGD on shared M5) ...", flush=True)
    import importlib

    import torch

    rwb = importlib.import_module("robustness_eval.white_box_attack")
    ref_m5 = importlib.import_module("audio_models.M5.M5Net")

    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.models.m5 import M5
    from audiopure_tpu.utils.torch_convert import convert_m5

    torch.manual_seed(3)
    tm5 = ref_m5.M5(n_input=1, n_output=10).eval()
    m5_vars = convert_m5(tm5.state_dict())
    jm5 = M5(n_output=10)

    t_ax = np.arange(L) / 16000.0
    xs, ys = [], []
    for ci in range(10):
        tone = 0.3 * np.sin(2 * np.pi * (300 + 300 * ci) * t_ax)
        xs.append(tone + 0.01 * rng.randn(L))
        ys.append(ci)
    xw = np.stack(xs)[:, None, :].astype(np.float32)
    # labels = the shared model's own clean predictions (random-weight
    # model; what matters is that both attack loops agree per-example)
    with torch.no_grad():
        yw = tm5(torch.from_numpy(xw)).argmax(-1).numpy()

    eps, iters = 0.02, 30
    ratk = rwb.AudioAttack(model=tm5, eps=eps, norm="linf",
                           learning_rate_1=eps / 5, max_iter_1=iters,
                           max_iter_2=0, eot_attack_size=1,
                           eot_defense_size=1, verbose=0)
    _, (succ_ref, _) = ratk.generate(torch.from_numpy(xw),
                                     torch.from_numpy(yw), targeted=False)
    jatk = AudioAttack(lambda xx, kk: jm5.apply(m5_vars, xx), eps=eps,
                       norm="linf", learning_rate_1=eps / 5,
                       max_iter_1=iters)
    _, succ = jatk.generate(jnp.asarray(xw), jnp.asarray(yw),
                            jax.random.PRNGKey(0))
    if isinstance(succ, tuple):
        succ = succ[0]
    ref_robust = 1.0 - float(np.mean(succ_ref))
    our_robust = 1.0 - float(np.mean(np.asarray(succ)))

    result = dict(
        host_cpu=dict(
            torch_eager_purify_s_per_utt=round(torch_s / B, 3),
            xla_cpu_purify_s_per_utt=round(xla_s / B, 3),
            xla_speedup_same_silicon=round(torch_s / xla_s, 3),
        ),
        full_scale_output_parity=dict(
            max_abs_diff=max_abs, signal_max=scale,
            rel=max_abs / scale,
        ),
        robust_acc_parity=dict(
            pgd_eps=eps, pgd_iters=iters, n_examples=len(yw),
            reference_robust_acc=ref_robust, our_robust_acc=our_robust,
            agree=bool(np.array_equal(np.asarray(succ), np.asarray(
                succ_ref, dtype=bool))),
        ),
        config=dict(B=B, L=L, T=T, t_star=T_STAR,
                    model="DiffWave 36x256 (full)"),
    )
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
