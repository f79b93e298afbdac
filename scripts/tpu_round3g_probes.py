"""Round-3g TPU probes: does the f32 pallas path compile and win now?

f32 previously fell back to XLA end-to-end (23.75 utt/s/chip): v5
cannot fit f32 buffers, and the v4/v3 per-layer kernels blew their
scoped-VMEM budgets. The budgets now scale with itemsize
(wavenet_block.py). Probe:
1. f32 pallas forward micro (v4 dispatch) at batch 16, tile 1600; on
   failure retry tile 800.
2. f32 end-to-end purify+classify (bench configuration, batch 16)
   pallas vs XLA conv path.
FLOP accounting: on TPU, f32 matmuls lower to 3-pass bf16 (~1/3 of
bf16 peak); report TF/s and utt/s without a % -of-peak claim.
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

    def chained(fn, x0, n=8):
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

    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models.wavenet import WaveNet

    L, GF, B = 16000, 0.604, 16
    net = WaveNet(dtype=jnp.float32)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))

    def micro(tile):
        def run():
            x = jax.random.normal(jax.random.PRNGKey(6), (B, 1, L)) * 0.3
            tt = jnp.zeros((B, 1))
            t = chained(lambda xx: wavenet_forward_pallas(
                wparams, xx, tt, dtype=jnp.float32, tile_l=tile), x)
            return dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=B,
                        tile=tile, tflops=round(GF * B / t, 1))
        return run

    for tile in (1600, 800):
        probe(f"f32_pallas_fwd_tile{tile}", micro(tile))
        if f"f32_pallas_fwd_tile{tile}" in results:
            break  # compiled and ran; skip the smaller tile

    # XLA f32 micro for the same comparison
    def xla_micro():
        x = jax.random.normal(jax.random.PRNGKey(6), (B, 1, L)) * 0.3
        tt = jnp.zeros((B, 1))
        t = chained(lambda xx: net.apply(wparams, xx, tt), x)
        return dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=B,
                    tflops=round(GF * B / t, 1))

    probe("f32_xla_fwd", xla_micro)

    # end-to-end purify+classify, f32, pallas vs xla
    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    def end_to_end(use_pallas):
        def run():
            fe = MelFrontEnd()
            clf = create_classifier("wideresnet28_10", num_classes=10)
            cvars = clf.init(jax.random.PRNGKey(2),
                             fe(jnp.zeros((1, 1, L))))
            classifier = lambda s: clf.apply(cvars, s)
            if use_pallas:
                eps = lambda xx, tt: wavenet_forward_pallas(
                    wparams, xx, tt, dtype=jnp.float32)
            else:
                eps = lambda xx, tt: net.apply(wparams, xx, tt)
            defender = RevDiffWave(eps, T=200, t=3, sample_step=1)
            system = AcousticSystem(classifier, fe, defender, "wave",
                                    defender_stochastic=True)
            f = hoisted_jit(lambda x, k: system(x, key=k))
            x = jax.random.normal(jax.random.PRNGKey(0), (B, 1, L)) * 0.05
            k = jax.random.PRNGKey(3)
            float(jnp.abs(f(x, k)[0]).sum())
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(jnp.abs(f(x, jax.random.PRNGKey(4 + rep))[0]).sum())
                best = min(best, time.perf_counter() - t0)
            return dict(utt_per_sec=round(B / best, 2), batch=B,
                        impl="pallas" if use_pallas else "xla")
        return run

    probe("f32_e2e_pallas", end_to_end(True))
    probe("f32_e2e_xla", end_to_end(False))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
