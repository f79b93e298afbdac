"""Round-3 on-chip probes (one TPU process; run alone).

Stages (env ROUND3_STAGES, comma-separated, default all):
  eot     — the north-star full EOT 15x15 PGD config: shared vs paired
            EOT stacks x replica-chunk sizes (VERDICT r3 item 1).
  train   — full 36x256 DiffWave train step: steps/s + MFU for the XLA
            autodiff and per-layer-VJP kernel paths + a falling-loss
            curve (VERDICT r3 item 2).
  certify — certification chunk/batch/dtype sweep (VERDICT r3 item 6).
  unet    — UNet forward utilization via XLA cost analysis, giving the
            DiffSpec datapoint a denominator (VERDICT r3 item 7).

All weights random (timing only; numerics are covered by the CPU parity
suite). JSON line per probe.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

STAGES = os.environ.get("ROUND3_STAGES", "eot,train,certify,unet").split(",")


def _materialize(out):
    import numpy as np

    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def timeit(fn, *args, reps=2):
    _materialize(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def probe(name, fn, results):
    t0 = time.perf_counter()
    try:
        results[name] = fn()
        results[name]["probe_wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"probe": name, **results[name]}), flush=True)
    except Exception as e:
        import traceback
        traceback.print_exc()
        results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"probe": name, **results[name]}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass

    print(f"devices: {jax.devices()}", flush=True)
    results = {}

    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd

    L = 16000
    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=jnp.bfloat16)
    x8 = jax.random.normal(jax.random.PRNGKey(0), (8, 1, L)) * 0.1
    cvars = clf.init(jax.random.PRNGKey(1), fe(x8[:1]))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)

    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2), x8[:1], jnp.zeros((1, 1)))
    eps_pallas = lambda xx, tt: wavenet_forward_pallas(
        wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)

    # ---------------- stage: eot ----------------------------------------
    if "eot" in STAGES:
        defender = RevDiffWave(eps_pallas, T=200, t=3)
        system = AcousticSystem(classifier, fe, defender, "wave",
                                defender_stochastic=True)
        model_fn = lambda xx, kk: system(xx, key=kk)
        E, ITR = 15, 5

        def eot_probe(share, chunk, B):
            def run():
                xa = x8[:B] if B <= 8 else jnp.concatenate(
                    [x8] * (B // 8), 0)
                ya = jnp.zeros((B,), jnp.int32)
                atk = AudioAttack(model_fn, eps=0.002, norm="linf",
                                  max_iter_1=ITR, learning_rate_1=0.0004,
                                  eot_attack_size=E, eot_defense_size=E,
                                  eot_chunk=chunk, share_eot=share)

                def attack(k):
                    out = atk.generate(xa, ya, k)
                    return out[0]

                t = timeit(attack, jax.random.PRNGKey(7))
                xadv = attack(jax.random.PRNGKey(8))
                dmax = float(jnp.abs(xadv - xa).max())
                assert dmax > 0, "attack did not move the input"
                ms_utt_iter = t * 1e3 / (B * ITR)
                return dict(ms_per_utt_iter=round(ms_utt_iter, 1),
                            ms_per_utt_iter_replica=round(
                                ms_utt_iter / E, 2),
                            share_eot=share, chunk=chunk, batch=B,
                            eot=E, iters=ITR)
            return run

        for share, chunk, B in [(True, 15, 8), (True, 5, 8),
                                (False, 15, 8), (False, 5, 8),
                                (True, 15, 16)]:
            probe(f"eot15_share{int(share)}_chunk{chunk}_b{B}",
                  eot_probe(share, chunk, B), results)

    # ---------------- stage: train --------------------------------------
    if "train" in STAGES:
        import numpy as np
        import optax

        from audiopure_tpu.diffusion.schedule import make_schedule
        from audiopure_tpu.kernels.wavenet_block_grad import \
            wavenet_forward_pallas_grad
        from audiopure_tpu.training.diffwave import (init_train_state,
                                                     make_train_step)

        B = int(os.environ.get("ROUND3_TRAIN_BATCH", "16"))
        # tone-like waveforms so the eps-MSE loss has structure to learn
        rng = np.random.RandomState(0)
        t_ax = np.arange(L) / 16000.0
        freqs = rng.uniform(200, 2000, size=(B, 1))
        phases = rng.uniform(0, 2 * np.pi, size=(B, 1))
        x0 = (0.5 * np.sin(2 * np.pi * freqs * t_ax[None, :] + phases)
              ).astype(np.float32)[:, None, :]
        x0 = jnp.asarray(x0)

        sched = make_schedule(200, 1e-4, 0.02)
        opt = optax.adam(2e-4)
        # fwd ~0.604 TFLOP/utt; fwd+bwd ~3x
        step_tflop = 3 * 0.604 * B
        PEAK = 197.0  # v5e bf16 TFLOP/s

        def train_probe(apply_fn, label, steps=30):
            def run():
                step_fn = jax.jit(make_train_step(apply_fn, sched, opt),
                                  donate_argnums=0)
                # donation consumes the state's buffers — give each probe
                # its own copy of the shared param tree
                state = init_train_state(
                    jax.tree_util.tree_map(jnp.copy, wparams), opt,
                    jax.random.PRNGKey(11))
                state, loss = step_fn(state, x0)   # compile + warm
                loss0 = float(loss)
                t0 = time.perf_counter()
                for _ in range(steps):
                    state, loss = step_fn(state, x0)
                lossN = float(loss)                # device->host barrier
                dt = time.perf_counter() - t0
                sps = steps / dt
                return dict(steps_per_sec=round(sps, 3),
                            ms_per_step=round(1e3 / sps, 1),
                            tflops=round(step_tflop * sps, 1),
                            pct_bf16_peak=round(
                                100 * step_tflop * sps / PEAK, 1),
                            batch=B, loss_first=round(loss0, 4),
                            loss_after=round(lossN, 4))
            return run

        net_remat = WaveNet(dtype=jnp.bfloat16, remat=True)
        xla_apply = lambda p, xx, tt: net.apply(p, xx, tt).astype(
            jnp.float32)
        remat_apply = lambda p, xx, tt: net_remat.apply(p, xx, tt).astype(
            jnp.float32)
        pallas_apply = lambda p, xx, tt: wavenet_forward_pallas_grad(
            p, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
        # full autodiff at B=16 OOMs (measured 17.5G of 15.75G) — the
        # remat variant is the production path; no-remat probed at B=8
        probe("train_xla_remat", train_probe(remat_apply, "xla_remat"),
              results)
        if B <= 8:
            probe("train_xla", train_probe(xla_apply, "xla"), results)
            probe("train_pallas_vjp", train_probe(pallas_apply, "pallas"),
                  results)

        # falling-loss evidence on the better path (XLA autodiff unless
        # the kernel path won)
        def curve():
            best = "train_xla_remat"
            step_fn = jax.jit(make_train_step(remat_apply, sched, opt),
                              donate_argnums=0)
            state = init_train_state(
                jax.tree_util.tree_map(jnp.copy, wparams), opt,
                jax.random.PRNGKey(12))
            losses = []
            for i in range(201):
                state, loss = step_fn(state, x0)
                if i % 20 == 0:
                    losses.append(round(float(loss), 4))
            return dict(path=best, losses_every_20=losses)

        probe("train_loss_curve", curve, results)

    # ---------------- stage: certify ------------------------------------
    if "certify" in STAGES:
        from audiopure_tpu.certify import RobustCertificate
        from audiopure_tpu.diffusion.ddpm import DDPMPurifier
        from audiopure_tpu.diffusion.schedule import make_schedule

        denoiser = DDPMPurifier(eps_pallas, make_schedule(200, 1e-4, 0.02))
        rc = RobustCertificate(classifier, fe, denoiser, num_classes=10)
        N = 1000

        def cert_probe(B, chunk, dtype):
            def run():
                xs = (x8[:B] if B <= 8 else jnp.concatenate(
                    [x8] * (B // 8), 0)).astype(dtype)
                t_star = rc.compute_t_star(1 / (1 + 0.25 ** 2))
                t = timeit(lambda: rc._counts(xs, jax.random.PRNGKey(3),
                                              N, 0.25, t_star, chunk))
                return dict(certs_per_sec_chip=round(B / t, 3),
                            noised_forwards_per_sec=round(B * N / t, 1),
                            batch=B, n=N, chunk=chunk, dtype=str(dtype))
            return run

        for B, chunk, dt in [(8, 16, jnp.float32), (8, 32, jnp.float32),
                             (16, 16, jnp.float32),
                             (8, 16, jnp.bfloat16),
                             (8, 48, jnp.bfloat16),
                             (16, 32, jnp.bfloat16)]:
            tag = "bf16" if dt == jnp.bfloat16 else "f32"
            probe(f"certify_b{B}_c{chunk}_{tag}", cert_probe(B, chunk, dt),
                  results)

    # ---------------- stage: unet ---------------------------------------
    if "unet" in STAGES:
        from audiopure_tpu.models.unet import create_unet

        def unet_probe(dtype, Bu):
            def run():
                unet = create_unet(dtype=dtype)
                uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                                           jnp.zeros((1, 1, 32, 32)),
                                           jnp.zeros((1,)))
                s = jax.random.normal(jax.random.PRNGKey(5),
                                      (Bu, 1, 32, 32))
                tt = jnp.full((Bu,), 10.0)
                fwd = jax.jit(lambda ss: unet.apply(uvars, ss, tt))
                try:
                    ca = fwd.lower(s).compile().cost_analysis()
                    flops = float(ca.get("flops", 0.0))
                except Exception:
                    flops = 0.0
                t = timeit(fwd, s)
                out = dict(ms_per_batch=round(t * 1e3, 2), batch=Bu,
                           xla_flops_per_batch=flops,
                           dtype=str(dtype.__name__))
                if flops:
                    out["tflops"] = round(flops / t / 1e12, 1)
                    out["pct_bf16_peak"] = round(
                        100 * flops / t / 1e12 / 197.0, 1)
                return out
            return run

        for dt, Bu in [(jnp.float32, 64), (jnp.bfloat16, 64),
                       (jnp.bfloat16, 256)]:
            probe(f"unet_forward_{dt.__name__}_b{Bu}", unet_probe(dt, Bu),
                  results)

        # DiffSpec PGD in bf16 (round-2 datapoint was f32: 30.0
        # ms/utt-iter) — the full attack workload with the bf16 UNet
        def diffspec_bf16_probe():
            from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion

            unet = create_unet(dtype=jnp.bfloat16)
            uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                                       jnp.zeros((1, 1, 32, 32)),
                                       jnp.zeros((1,)))
            ueps = lambda s, t: unet.apply(uvars, s, t.reshape(-1)).astype(
                jnp.float32)
            spec_def = RevSpecDiffusion(ueps, t=50)
            sys_spec = AcousticSystem(classifier, fe, spec_def, "spec",
                                      defender_stochastic=True)
            Bs, ITR = 8, 5
            xs = jax.random.normal(jax.random.PRNGKey(5),
                                   (Bs, 1, 16000)) * 0.1
            ys = jnp.zeros((Bs,), jnp.int32)
            atk = AudioAttack(lambda xx, kk: sys_spec(xx, key=kk),
                              eps=0.002, max_iter_1=ITR,
                              learning_rate_1=0.0004)
            t = timeit(lambda: atk.generate(xs, ys,
                                            jax.random.PRNGKey(6))[0])
            return dict(ms_per_utt_iter=round(t * 1e3 / (Bs * ITR), 2),
                        batch=Bs, iters=ITR, t_spec=50, dtype="bf16")

        probe("diffspec_pgd_bf16", diffspec_bf16_probe, results)

        # KWS bucket (L=24000, v4 fallback) batch scaling: analytic
        # 0.906 TFLOP per forward per utterance
        def kws_fwd_probe(Bk):
            def run():
                xk = jax.random.normal(jax.random.PRNGKey(6),
                                       (Bk, 1, 24000))
                wp = jax.tree_util.tree_map(jnp.copy, wparams)
                fwd = jax.jit(lambda xx: wavenet_forward_pallas(
                    wp, xx, jnp.zeros((Bk, 1)), dtype=jnp.bfloat16))
                t = timeit(fwd, xk)
                tf = 0.906 * Bk / t
                return dict(ms_per_batch=round(t * 1e3, 2), batch=Bk,
                            tflops=round(tf, 1),
                            pct_bf16_peak=round(100 * tf / 197.0, 1))
            return run

        for Bk in (4, 8, 16):
            probe(f"kws_bucket_forward_b{Bk}", kws_fwd_probe(Bk), results)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
