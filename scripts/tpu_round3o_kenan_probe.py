"""Round-3o: Kenansville re-measure after the jit fix.

Round 3j first measured Kenansville FFT/SSA at 1338.6/1126.7 ms/utt
(batch 4) — ~3x the query-FLOP bound, traced to `generate` running
eagerly (every outer op paid the ~37 ms remote-dispatch latency).
`KenansvilleAttack.generate` is now compiled as one hoisted program
(commit "Compile Kenansville generate as one hoisted program"); the
re-measurement was blocked by a TPU-backend outage. This is that
re-measurement, same methodology as 3j (best of 2, host
materialisation barrier via np.asarray).
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

    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd

    B, L = 4, 16000
    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=jnp.bfloat16)
    cvars = clf.init(jax.random.PRNGKey(2), fe(jnp.zeros((1, 1, L))))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)
    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(3),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    eps = lambda xx, tt: wavenet_forward_pallas(
        wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
    defender = RevDiffWave(eps, T=200, t=3)
    system = AcousticSystem(classifier, fe, defender, "wave",
                            defender_stochastic=True)
    model_fn = lambda xx, kk: system(xx, key=kk)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, 1, L)) * 0.1
    y = jnp.zeros((B,), jnp.int32)

    def kenan_probe(method):
        def run():
            from audiopure_tpu.attacks import KenansvilleAttack
            atk = KenansvilleAttack(model_fn, method=method)
            gen = lambda k: atk.generate(x, y, k)[0]
            np.asarray(gen(jax.random.PRNGKey(8)))
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                out = np.asarray(gen(jax.random.PRNGKey(9 + rep)))
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(out).all()
            return dict(ms_per_utt=round(best * 1e3 / B, 2), batch=B,
                        method=method)
        return run

    probe("kenansville_fft_b4_jit", kenan_probe("fft"))
    probe("kenansville_ssa_b4_jit", kenan_probe("ssa"))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
