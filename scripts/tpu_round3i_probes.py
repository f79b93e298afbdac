"""Round-3i TPU probes: DiffSpec depth datapoints.

1. DiffSpec PGD with grad_mode='full' (differentiating through the
   UNet inside the t=50 reverse scan — the stronger adaptive attack the
   reference cannot express on the spec path), batch 8, bf16.
   Comparison point: grad_mode='ref' measured 24.9 ms/utt-iter at b8.
2. DiffSpec PGD at the reference flagship EOT 15x15 (share_eot,
   chunk 15), batch 8 — mirrors the waveform-path eot15 bench key.
   A100-est denominator stays 21.9 ms/utt-iter/replica (2 purify-fwd
   equivalents per replica-iteration, 46% MFU grant).
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
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.unet import create_unet
    from audiopure_tpu.ops import MelFrontEnd

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

    def run_attack(Bs, grad_mode, eot, chunk, share):
        def run():
            spec_def = RevSpecDiffusion(ueps, t=50, grad_mode=grad_mode)
            sys_spec = AcousticSystem(classifier, fe, spec_def, "spec",
                                      defender_stochastic=True)
            ITR = 5
            xs = jax.random.normal(jax.random.PRNGKey(5),
                                   (Bs, 1, 16000)) * 0.1
            ys = jnp.zeros((Bs,), jnp.int32)
            atk = AudioAttack(lambda xx, kk: sys_spec(xx, key=kk),
                              eps=0.002, max_iter_1=ITR,
                              learning_rate_1=0.0004,
                              eot_attack_size=eot, eot_defense_size=eot,
                              eot_chunk=chunk, share_eot=share)

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
            r = dict(ms_per_utt_iter=round(ms, 2), batch=Bs, iters=ITR,
                     t_spec=50, grad_mode=grad_mode, eot=eot)
            if eot > 1:
                r["ms_per_utt_iter_replica"] = round(ms / eot, 2)
                r["vs_a100_est"] = round(21.9 / (ms / eot), 2)
            else:
                r["vs_a100_est"] = round(21.9 / ms, 2)
            return r
        return run

    probe("diffspec_fullgrad_b8", run_attack(8, "full", 1, None, False))
    probe("diffspec_eot15_b8",
          run_attack(8, "ref", 15, 15, True))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
