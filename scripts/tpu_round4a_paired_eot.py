"""Round-4a: exact-pairing EOT — fused schedule A/B + cost decomposition.

VERDICT r3 #3: the reference estimator (independent defense + attack EOT
stacks per PGD iteration, ``white_box_attack.py:386-435``) measured
21.6 ms/utt-iter-replica (1.16x A100) vs 11.93 shared. Hypothesised
floor: the purify forward is ~95% of bf16 peak at effective batch 120
(2x fwd + cheap stop-grad bwd ~= 20-21 ms/replica), so the remaining gap
is schedule, not compute. This probe settles it:

1. paired two-pass (round-3 regression arm);
2. paired pair_fused (ONE 2R-replica dispatch, ``EOT.paired``);
3. decomposition: defense-stack-only and attack-stack-only per-iter
   costs in the same scan harness (floor arithmetic);
4. forward saturation: purify fwd at replica counts 15 vs 30
   (effective batch 120 vs 240) — if flat, batching is saturated and
   the fused schedule can only win on dispatch overlap.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from scripts.tpu_round3_probes import _materialize, probe, timeit  # noqa


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
    from audiopure_tpu.attacks.eot import EOT
    from audiopure_tpu.attacks.losses import cross_entropy
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils.jit_utils import hoisted_jit

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
    defender = RevDiffWave(eps_pallas, T=200, t=3)
    system = AcousticSystem(classifier, fe, defender, "wave")
    model_fn = lambda xx, kk: system(xx, key=kk)

    E, ITR, B = 15, 5, 8
    ya = jnp.zeros((B,), jnp.int32)

    # ---- 1+2: paired two-pass vs pair_fused ---------------------------
    def eot_probe(mode):
        def run():
            atk = AudioAttack(model_fn, eps=0.002, norm="linf",
                              max_iter_1=ITR, learning_rate_1=0.0004,
                              eot_attack_size=E, eot_defense_size=E,
                              eot_chunk=E,
                              pair_fused=(mode == "fused"))

            def attack(k):
                return atk.generate(x8, ya, k)[0]

            t = timeit(attack, jax.random.PRNGKey(7))
            xadv = attack(jax.random.PRNGKey(8))
            dmax = float(jnp.abs(xadv - x8).max())
            assert dmax > 0, "attack did not move the input"
            ms_utt_iter = t * 1e3 / (B * ITR)
            return dict(ms_per_utt_iter=round(ms_utt_iter, 1),
                        ms_per_utt_iter_replica=round(ms_utt_iter / E, 2),
                        mode=mode, batch=B, eot=E, iters=ITR)
        return run

    probe("paired_two_pass", eot_probe("two_pass"), results)
    probe("paired_fused", eot_probe("fused"), results)

    # ---- 3: decomposition — per-iter stack costs in a scan ------------
    # same point-update structure as the attack scan so XLA sees the
    # same program shape; a dummy delta advance keeps iterations
    # sequentially dependent (no cross-iteration batching).
    eot_fwd = EOT(model_fn, cross_entropy, E, use_grad=False)
    eot_grad = EOT(model_fn, cross_entropy, E, use_grad=True)

    def scan_cost(body):
        def outer(x, key):
            def step(carry, k):
                delta = carry
                upd = body(x + delta, k)
                return delta + 1e-6 * upd, None
            keys = jax.random.split(key, ITR)
            out, _ = jax.lax.scan(step, jnp.zeros_like(x), keys)
            return out
        jitted = hoisted_jit(outer)

        def run():
            t = timeit(jitted, x8, jax.random.PRNGKey(3))
            ms_utt_iter = t * 1e3 / (B * ITR)
            return dict(ms_per_utt_iter=round(ms_utt_iter, 1),
                        ms_per_utt_iter_replica=round(ms_utt_iter / E, 2),
                        batch=B, eot=E, iters=ITR)
        return run

    def defense_body(xp, k):
        scores, _, _, _ = eot_fwd(xp, ya, k, use_grad=False)
        # fold the scores back into the carry so nothing is DCE'd
        return jnp.zeros_like(xp) + jnp.sign(scores.max())

    def attack_body(xp, k):
        _, _, grad, _ = eot_grad(xp, ya, k, use_grad=True)
        return jnp.sign(grad)

    probe("stack_defense_fwd_only", scan_cost(defense_body), results)
    probe("stack_attack_fwd_bwd", scan_cost(attack_body), results)

    # ---- 4: forward saturation: purify at 15 vs 30 replicas -----------
    def purify_replicas(R):
        def outer(x, key):
            keys = jax.random.split(key, R)
            outs = jax.vmap(lambda k: defender(x, k))(keys)
            return outs.sum(axis=0)
        jitted = hoisted_jit(outer)

        def run():
            t = timeit(jitted, x8, jax.random.PRNGKey(4))
            return dict(ms_per_utt_replica=round(
                t * 1e3 / (B * R), 2), replicas=R, batch=B,
                eff_batch=B * R)
        return run

    probe("purify_fwd_15rep", purify_replicas(15), results)
    probe("purify_fwd_30rep", purify_replicas(30), results)

    with open("/tmp/round4a_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
