"""Round-3b TPU probes: v5x long-audio kernel + DiffSpec batch scaling.

1. KWS bucket (L=24000 bf16) forward, chained-scan — the dispatch now
   routes to v5x (hbm_io) instead of the v4 fallback; round-3 v4
   numbers to beat: 133.7 TF/s b4 / 150.0 TF/s b16 (76.2% peak).
2. KWS bucket PGD attack at batch 4/16 — round-3 v4 numbers: 43.2 /
   40.2 ms/utt-iter (1.75x / 1.88x the A100-est 75.7).
3. DiffSpec PGD (bf16 UNet, t=50) at batch 8/32/64 — round-3 batch-8
   number: 25.9 ms/utt-iter = 0.85x the 21.9 ms A100-est; the UNet
   forward measures 53.4% peak at batch 64, so larger eval batches
   should cross 1.0x.
4. Flagship L=16000 chained forward — regression check that the
   dispatch change kept v5 (est 117.0 <= 118) and its 87.7%-peak perf.
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    def chained(fn, x0, n):
        @jax.jit
        def run(x):
            def body(c, _):
                y = fn(c)
                return y / (jnp.abs(y).max() + 1e-6), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.abs(out).sum()

        float(run(x0))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = float(run(x0))  # scalar fetch barrier
            best = min(best, time.perf_counter() - t0)
        assert s == s
        return best / n

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

    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models.wavenet import WaveNet

    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))

    # ---- 1. KWS bucket forward (now v5x), chained ----------------------
    def kws_probe(Bk, L=24000, gf=0.906):
        def run():
            xk = jax.random.normal(jax.random.PRNGKey(6), (Bk, 1, L))
            tt = jnp.zeros((Bk, 1))
            t = chained(lambda xx: wavenet_forward_pallas(
                wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32),
                xk, 8)
            tf = gf * Bk / t
            return dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=Bk,
                        L=L, tflops=round(tf, 1),
                        pct_bf16_peak=round(100 * tf / 197.0, 1))
        return run

    for Bk in (4, 16):
        probe(f"kws_v5x_chained_b{Bk}", kws_probe(Bk))

    # ---- 4. flagship L=16000 regression (still v5) ---------------------
    probe("flagship_chained_b16", kws_probe(16, L=16000, gf=0.604))

    # ---- 2. KWS bucket attack (now v5x) --------------------------------
    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd

    def kws_attack_probe(Bk):
        def run():
            Lb, ITR = 24000, 5
            fe40 = MelFrontEnd(n_mels=40)
            kws = create_classifier("kwsmodel", num_classes=4)
            xk = jax.random.normal(jax.random.PRNGKey(7),
                                   (Bk, 1, Lb)) * 0.1
            kvars = kws.init(jax.random.PRNGKey(8), fe40(xk[:1]))
            kclf = lambda ss: kws.apply(kvars, ss)
            eps = lambda xx, tt: wavenet_forward_pallas(
                wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
            wave_def = RevDiffWave(eps, T=200, t=3)
            sys_kws = AcousticSystem(kclf, fe40, wave_def, "wave",
                                     defender_stochastic=True)
            atk = AudioAttack(lambda xx, kk: sys_kws(xx, key=kk),
                              eps=0.002, max_iter_1=ITR,
                              learning_rate_1=0.0004)
            yk = jnp.zeros((Bk,), jnp.int32)

            def attack(k):
                return atk.generate(xk, yk, k)[0]

            np.asarray(attack(jax.random.PRNGKey(9)))  # compile+warm
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                out = np.asarray(attack(jax.random.PRNGKey(10 + rep)))
                best = min(best, time.perf_counter() - t0)
            assert np.abs(out - np.asarray(xk)).max() > 0
            return dict(ms_per_utt_iter=round(best * 1e3 / (Bk * ITR), 2),
                        batch=Bk, iters=ITR, bucket_len=Lb,
                        vs_a100_est=round(75.7 / (best * 1e3
                                                  / (Bk * ITR)), 2))
        return run

    for Bk in (4, 16):
        probe(f"kws_attack_v5x_b{Bk}", kws_attack_probe(Bk))

    # ---- 3. DiffSpec PGD batch scaling ---------------------------------
    from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
    from audiopure_tpu.models.unet import create_unet

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

            np.asarray(attack(jax.random.PRNGKey(6)))  # compile+warm
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

    for Bs in (8, 32, 64):
        probe(f"diffspec_pgd_bf16_b{Bs}", diffspec_probe(Bs))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
