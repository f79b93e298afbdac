"""Round-4d: DiffSpec to >=1x at batch-8 EOT-1 and clean purify.

VERDICT r3 weak #1 / next #2: the spec path records 0.88x the A100
FLOP-model estimate at batch-8 EOT-1 PGD (24.94 ms/utt-iter vs the
21.9 ms grant, docs/BENCH.md round 3b) and ~0.85x clean purification.
The pallas conv A/B (round 3n) was negative at model level, so the
levers here are schedule, not kernels:

1. decomposition — chained UNet forward at b8/b16/b32/b64 (ms/step)
   plus the defended-system forward (purify+mel+WRN) at b8: sizes the
   small-batch fixed cost and the classifier share;
2. clean purify b8 with scan unroll 1/2/4 (``RevSpecDiffusion(unroll=)``,
   schedule-only knob);
3. PGD b8 EOT-1: two-pass control (round-3b regression) vs
   ``pair_fused`` — the exact reference pairing (two independent EOT
   stacks, ``white_box_attack.py:386-435``) scheduled as ONE
   2R-replica dispatch, so the two sequential batch-8 purify programs
   per iteration become one batch-16-effective program;
4. pair_fused + unroll combined.

A100 denominators (docs/BENCH.md round 3): purify fwd = 50 x 15.73 GF
/ 71.8 TF/s = 10.95 ms/utt; PGD iter = 2 purify equivalents =
21.9 ms/utt-iter.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from scripts.tpu_round3_probes import _materialize, probe, timeit  # noqa

A100_PURIFY_MS = 10.95
A100_ITER_MS = 21.9


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
    from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.unet import create_unet
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=jnp.bfloat16)
    cvars = clf.init(jax.random.PRNGKey(2), fe(jnp.zeros((1, 1, 16000))))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)
    unet = create_unet(dtype=jnp.bfloat16)
    uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                               jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
    ueps = lambda s, t: unet.apply(uvars, s, t.reshape(-1)).astype(
        jnp.float32)

    # ---- 1. decomposition: chained UNet fwd ---------------------------
    def unet_chain_probe(B, n=50):
        def run():
            @hoisted_jit
            def chain(x0):
                def step(x, i):
                    e = ueps(x, jnp.full((x.shape[0],), 25.0)[:, None])
                    return 0.999 * x - 0.001 * e, None
                x, _ = jax.lax.scan(step, x0, jnp.arange(n))
                return x
            x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 32))
            s = timeit(chain, x0)
            ms_step = s * 1e3 / n
            return dict(ms_per_step_batch=round(ms_step, 3), batch=B,
                        ms_per_img_step=round(ms_step / B, 4),
                        tflops=round(B * 15.73e-3 / (ms_step * 1e-3), 1))
        return run

    for B in (8, 16, 32, 64):
        probe(f"unet_fwd_chain_b{B}", unet_chain_probe(B), results)

    # ---- 2. clean purify b8: unroll sweep ------------------------------
    def purify_probe(B, unroll):
        def run():
            d = RevSpecDiffusion(ueps, t=50, unroll=unroll)

            @hoisted_jit
            def purify(spec, key):
                return d(spec, key)

            spec = fe(jax.random.normal(jax.random.PRNGKey(1),
                                        (B, 1, 16000)) * 0.1)
            key = jax.random.PRNGKey(7)
            s = timeit(purify, spec, key)
            ms_utt = s * 1e3 / B
            return dict(ms_per_utt=round(ms_utt, 2), batch=B,
                        unroll=unroll,
                        vs_a100_est=round(A100_PURIFY_MS / ms_utt, 2))
        return run

    for u in (1, 2, 4):
        probe(f"spec_purify_clean_b8_unroll{u}", purify_probe(8, u),
              results)
    probe("spec_purify_clean_b16_unroll1", purify_probe(16, 1), results)

    # ---- 3. defended-system forward b8 (classifier share) -------------
    def sysfwd_probe(B):
        def run():
            d = RevSpecDiffusion(ueps, t=50)
            sys_spec = AcousticSystem(classifier, fe, d, "spec",
                                      defender_stochastic=True)

            @hoisted_jit
            def fwd(x, key):
                return sys_spec(x, key=key)

            x = jax.random.normal(jax.random.PRNGKey(5), (B, 1, 16000)) * 0.1
            s = timeit(fwd, x, jax.random.PRNGKey(9))
            return dict(ms_per_utt=round(s * 1e3 / B, 2), batch=B)
        return run

    probe("spec_system_fwd_b8", sysfwd_probe(8), results)

    # ---- 4. PGD b8 EOT-1: two-pass control vs pair_fused ---------------
    def pgd_probe(B, pair_fused, unroll=1, itr=5):
        def run():
            d = RevSpecDiffusion(ueps, t=50, unroll=unroll)
            sys_spec = AcousticSystem(classifier, fe, d, "spec",
                                      defender_stochastic=True)
            atk = AudioAttack(lambda xx, kk: sys_spec(xx, key=kk),
                              eps=0.002, max_iter_1=itr,
                              learning_rate_1=0.0004,
                              pair_fused=pair_fused)
            xs = jax.random.normal(jax.random.PRNGKey(5),
                                   (B, 1, 16000)) * 0.1
            ys = jnp.zeros((B,), jnp.int32)

            def attack(k):
                return atk.generate(xs, ys, k)[0]

            import numpy as np
            np.asarray(attack(jax.random.PRNGKey(9)))
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                out = np.asarray(attack(jax.random.PRNGKey(10 + rep)))
                best = min(best, time.perf_counter() - t0)
            assert np.abs(out - np.asarray(xs)).max() > 0
            ms = best * 1e3 / (B * itr)
            return dict(ms_per_utt_iter=round(ms, 2), batch=B, iters=itr,
                        pair_fused=pair_fused, unroll=unroll,
                        vs_a100_est=round(A100_ITER_MS / ms, 2))
        return run

    probe("diffspec_pgd_b8_twopass", pgd_probe(8, False), results)
    probe("diffspec_pgd_b8_pair_fused", pgd_probe(8, True), results)
    probe("diffspec_pgd_b8_pair_fused_unroll2", pgd_probe(8, True, 2),
          results)

    with open("/tmp/round4d_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
