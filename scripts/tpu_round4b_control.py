"""Round-4b: attribute the 23.75 vs 29.39 utt/s f32-XLA control swing.

VERDICT r3 weak #7: the XLA-conv f32 end-to-end control was 23.75
utt/s/chip in round 2 (bench.py) and 29.39 in round 3g (probe harness,
batch 16) with the delta unattributed. Both harnesses in ONE session:

1. probe-style purify+classify, f32 XLA conv, batch 16 (3g replica);
2. same, batch 96 (bench.py's f32 default batch);
3. bench.py subprocess, BENCH_DTYPE=f32 BENCH_CONV=xla (batch 96);
4. bench.py subprocess at BENCH_BATCH=16.

If (1) vs (2) shows a batch effect and (2)~(3), the swing is batch
config, not harness; if (1)~(2) but (3) differs, it's bench.py
methodology (keys-split-per-iter, ITERS, warmup); else session drift.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from scripts.tpu_round3_probes import probe, timeit  # noqa


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
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    L = 16000
    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=jnp.float32)
    x16 = jax.random.normal(jax.random.PRNGKey(0), (16, 1, L)) * 0.1
    cvars = clf.init(jax.random.PRNGKey(1), fe(x16[:1]))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)

    net = WaveNet(dtype=jnp.float32)
    wparams = net.init(jax.random.PRNGKey(2), x16[:1], jnp.zeros((1, 1)))
    eps_xla = lambda xx, tt: net.apply(wparams, xx, tt).astype(
        jnp.float32)
    defender = RevDiffWave(eps_xla, T=200, t=3)
    system = AcousticSystem(classifier, fe, defender, "wave")
    fwd = hoisted_jit(lambda xx, kk: system(xx, key=kk))

    def e2e(B):
        def run():
            xb = jnp.concatenate([x16] * (B // 16), 0) if B > 16 \
                else x16[:B]
            t = timeit(lambda k: fwd(xb, k), jax.random.PRNGKey(5))
            return dict(utt_per_sec=round(B / t, 2), batch=B,
                        dtype="f32", conv="xla")
        return run

    probe("probe_f32_xla_b16", e2e(16), results)
    probe("probe_f32_xla_b96", e2e(96), results)

    # bench.py subprocesses (same session, same chip, same cache)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, batch in (("bench_f32_xla_b96", None),
                        ("bench_f32_xla_b16", "16")):
        env = dict(os.environ, BENCH_DTYPE="f32", BENCH_CONV="xla",
                   BENCH_EOT="0", BENCH_FULL_EOT="0",
                   BENCH_EOT_PAIRED="0")
        if batch:
            env["BENCH_BATCH"] = batch
        t0 = time.perf_counter()
        out = subprocess.run([sys.executable,
                              os.path.join(here, "bench.py")],
                             env=env, capture_output=True, text=True,
                             timeout=4000)
        wall = round(time.perf_counter() - t0, 1)
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")]
        try:
            rec = json.loads(line[-1])
            results[name] = {"utt_per_sec": rec["value"],
                             "batch": batch or "default(96)",
                             "wall_s": wall}
        except Exception:
            results[name] = {"error": (out.stdout + out.stderr)[-300:],
                             "wall_s": wall}
        print(json.dumps({"probe": name, **results[name]}), flush=True)

    with open("/tmp/round4b_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
