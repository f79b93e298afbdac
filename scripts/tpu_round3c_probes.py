"""Round-3c TPU probes: gates-remat training MFU + UNet after norm fix.

1. DiffWave train step (bf16, 36x256, L=16000) at batch 16 with
   remat='gates' (save gate transcendentals, recompute elementwise
   only) vs round-3 'block' remat (2.85 steps/s = 42.0% MFU) and the
   batch-8 no-remat reference (7.20 steps/s = 53.0%).
2. UNet bf16 chained forward at batch 64/256 after the GroupNorm
   compute-dtype fix (was 105.1 TF/s = 53.4% peak at b64: every norm
   output was f32-promoted, doubling elementwise bandwidth).
3. DiffSpec PGD bf16 at batch 8 after the same fix (was 25.9
   ms/utt-iter = 0.85x the 21.9 ms A100 estimate).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    results = {}

    def probe(name, fn):
        try:
            results[name] = fn()
            print(json.dumps({"probe": name, **results[name]}),
                  flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)

    # ---- 1. training: gates remat --------------------------------------
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    L = 16000
    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))

    rng = np.random.RandomState(0)
    t_ax = np.arange(L) / 16000.0

    sched = make_schedule(200, 1e-4, 0.02)
    opt = optax.adam(2e-4)
    PEAK = 197.0

    def train_probe(remat_mode, B, steps=30):
        def run():
            freqs = rng.uniform(200, 2000, size=(B, 1))
            phases = rng.uniform(0, 2 * np.pi, size=(B, 1))
            x0 = jnp.asarray(
                (0.5 * np.sin(2 * np.pi * freqs * t_ax[None, :] + phases)
                 ).astype(np.float32)[:, None, :])
            net_r = WaveNet(dtype=jnp.bfloat16, remat=remat_mode)
            apply_fn = lambda p, xx, tt: net_r.apply(p, xx, tt).astype(
                jnp.float32)
            step_fn = jax.jit(make_train_step(apply_fn, sched, opt),
                              donate_argnums=0)
            state = init_train_state(
                jax.tree_util.tree_map(jnp.copy, wparams), opt,
                jax.random.PRNGKey(11))
            state, loss = step_fn(state, x0)
            loss0 = float(loss)
            t0 = time.perf_counter()
            for _ in range(steps):
                state, loss = step_fn(state, x0)
            lossN = float(loss)
            dt = time.perf_counter() - t0
            sps = steps / dt
            step_tflop = 3 * 0.604 * B
            return dict(steps_per_sec=round(sps, 3),
                        ms_per_step=round(1e3 / sps, 1),
                        tflops=round(step_tflop * sps, 1),
                        pct_bf16_peak=round(100 * step_tflop * sps / PEAK,
                                            1),
                        batch=B, remat=str(remat_mode),
                        loss_first=round(loss0, 4),
                        loss_after=round(lossN, 4))
        return run

    probe("train_gates_b16", train_probe("gates", 16))
    probe("train_gates_b8", train_probe("gates", 8))
    probe("train_gates_b32", train_probe("gates", 32))

    # ---- 2. UNet bf16 chained after norm fix ---------------------------
    from audiopure_tpu.models.unet import create_unet

    UNET_GF = 15.73

    def chained(fn, x0, n):
        @jax.jit
        def run(x):
            def body(c, _):
                y = fn(c)
                return y / (jnp.abs(y).max() + 1e-6), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.abs(out).sum()

        float(run(x0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = float(run(x0))
            best = min(best, time.perf_counter() - t0)
        assert s == s
        return best / n

    def unet_probe(Bu):
        def run():
            unet = create_unet(dtype=jnp.bfloat16)
            uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                                       jnp.zeros((1, 1, 32, 32)),
                                       jnp.zeros((1,)))
            tt = jnp.full((Bu,), 10.0)
            s = jax.random.normal(jax.random.PRNGKey(5), (Bu, 1, 32, 32))
            t = chained(lambda ss: unet.apply(uvars, ss, tt).astype(
                jnp.float32), s, 16)
            tf = UNET_GF * 1e-3 * Bu / t
            return dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=Bu,
                        tflops=round(tf, 1),
                        pct_bf16_peak=round(100 * tf / 197.0, 1))
        return run

    for Bu in (8, 64, 256):
        probe(f"unet_normfix_b{Bu}", unet_probe(Bu))

    # ---- 3. DiffSpec PGD bf16 b8 after norm fix ------------------------
    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd

    def diffspec_probe(Bs):
        def run():
            fe = MelFrontEnd()
            clf = create_classifier("wideresnet28_10", num_classes=10,
                                    dtype=jnp.bfloat16)
            cvars = clf.init(jax.random.PRNGKey(2),
                             fe(jnp.zeros((1, 1, 16000))))
            classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)
            unet = create_unet(dtype=jnp.bfloat16)
            uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                                       jnp.zeros((1, 1, 32, 32)),
                                       jnp.zeros((1,)))
            ueps = lambda s, t: unet.apply(uvars, s,
                                           t.reshape(-1)).astype(
                jnp.float32)
            spec_def = RevSpecDiffusion(ueps, t=50)
            sys_spec = AcousticSystem(classifier, fe, spec_def, "spec",
                                      defender_stochastic=True)
            ITR = 5
            xs = jax.random.normal(jax.random.PRNGKey(5),
                                   (Bs, 1, 16000)) * 0.1
            ys = jnp.zeros((Bs,), jnp.int32)
            atk = AudioAttack(lambda xx, kk: sys_spec(xx, key=kk),
                              eps=0.002, max_iter_1=ITR,
                              learning_rate_1=0.0004)

            def attack(k):
                return atk.generate(xs, ys, k)[0]

            np.asarray(attack(jax.random.PRNGKey(6)))
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                out = np.asarray(attack(jax.random.PRNGKey(7 + rep)))
                best = min(best, time.perf_counter() - t0)
            assert np.abs(out - np.asarray(xs)).max() > 0
            ms = best * 1e3 / (Bs * ITR)
            return dict(ms_per_utt_iter=round(ms, 2), batch=Bs,
                        iters=ITR, t_spec=50, dtype="bf16",
                        vs_a100_est=round(21.9 / ms, 2))
        return run

    for Bs in (8, 64):
        probe(f"diffspec_normfix_b{Bs}", diffspec_probe(Bs))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
