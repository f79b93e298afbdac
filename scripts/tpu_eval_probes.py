"""On-chip perf probes for the non-headline eval paths (one TPU process).

Records the datapoints VERDICT round 1 flagged as missing:
  * certification throughput (certs/sec and noised-forwards/sec) on the
    full WRN-28-10 + one-shot-denoiser stack (BASELINE configs[4]);
  * DiffSpec (UNet spectrogram purifier) under PGD: ms/utt-iter;
  * KWS (RCNN) + VP-SDE purifier under PGD at a bucket length.

All weights random (timing-only — accuracy datapoints come from the CPU
parity suite and the tone-model capstone). Run alone (exclusive grant).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _materialize(out):
    # device->host transfer as the completion barrier: through the
    # remote-execution tunnel block_until_ready can return before the
    # program finishes (CLAUDE.md / docs/BENCH.md); outputs here are
    # small (<1 MB) so transfer cost is negligible
    import numpy as np

    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def timeit(fn, *args, reps=3):
    _materialize(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    results = {}

    # ---------- certification throughput (configs[4]) --------------------
    from audiopure_tpu.certify import RobustCertificate
    from audiopure_tpu.diffusion.ddpm import DDPMPurifier
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd

    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=jnp.bfloat16)
    x8 = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 16000)) * 0.1
    cvars = clf.init(jax.random.PRNGKey(1), fe(x8[:1]))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)

    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas

    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2), x8[:1], jnp.zeros((1, 1)))
    eps_fn = lambda xx, tt: net.apply(wparams, xx, tt).astype(jnp.float32)
    # production eps-net path: the fused pallas kernel (leaner + faster
    # than the XLA conv path, which OOMs at chunk*B=128 on one chip)
    eps_pallas = lambda xx, tt: wavenet_forward_pallas(
        wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
    denoiser = DDPMPurifier(eps_pallas, make_schedule(200, 1e-4, 0.02))

    def probe(name, fn):
        try:
            results[name] = fn()
            print(json.dumps({"probe": name, **results[name]}), flush=True)
        except Exception as e:  # keep later probes alive
            import traceback
            traceback.print_exc()
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

    def certify_probe():
        rc = RobustCertificate(classifier, fe, denoiser, num_classes=10)
        B, N, CHUNK = 8, 1000, 8
        t = timeit(lambda: rc._counts(x8, jax.random.PRNGKey(3), N, 0.25,
                                      rc.compute_t_star(
                                          1 / (1 + 0.25 ** 2)), CHUNK))
        return dict(certs_per_sec_chip=round(B / t, 3),
                    noised_forwards_per_sec=round(B * N / t, 1),
                    batch=B, n=N, chunk=CHUNK, sec=round(t, 2))

    probe("certify", certify_probe)

    # ---------- DiffSpec PGD ---------------------------------------------
    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
    from audiopure_tpu.models.unet import create_unet

    unet = create_unet()
    uvars = jax.jit(unet.init)(jax.random.PRNGKey(4),
                               jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
    ueps = lambda s, t: unet.apply(uvars, s, t.reshape(-1))
    spec_def = RevSpecDiffusion(ueps, t=50)
    sys_spec = AcousticSystem(classifier, fe, spec_def, "spec",
                              defender_stochastic=True)
    Bs, ITR = 8, 5

    def diffspec_probe():
        xs = jax.random.normal(jax.random.PRNGKey(5), (Bs, 1, 16000)) * 0.1
        ys = jnp.zeros((Bs,), jnp.int32)
        atk = AudioAttack(lambda xx, kk: sys_spec(xx, key=kk), eps=0.002,
                          max_iter_1=ITR, learning_rate_1=0.0004)
        t = timeit(lambda: atk.generate(xs, ys, jax.random.PRNGKey(6))[0])
        return dict(ms_per_utt_iter=round(t * 1e3 / (Bs * ITR), 2),
                    batch=Bs, iters=ITR, t_spec=50)

    probe("diffspec_pgd", diffspec_probe)

    # ---------- KWS + VP-SDE PGD at a bucket length ----------------------
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier as cc

    def kws_probe():
        Lb = 24000  # 1.5 s bucket
        fe40 = MelFrontEnd(n_mels=40)
        kws = cc("kwsmodel", num_classes=4)
        xk = jax.random.normal(jax.random.PRNGKey(7), (4, 1, Lb)) * 0.1
        kvars = kws.init(jax.random.PRNGKey(8), fe40(xk[:1]))
        kclf = lambda s: kws.apply(kvars, s)
        wave_def = RevDiffWave(eps_pallas, T=200, t=3)
        sys_kws = AcousticSystem(kclf, fe40, wave_def, "wave",
                                 defender_stochastic=True)
        atkk = AudioAttack(lambda xx, kk: sys_kws(xx, key=kk), eps=0.002,
                           max_iter_1=ITR, learning_rate_1=0.0004)
        yk = jnp.zeros((4,), jnp.int32)
        t = timeit(lambda: atkk.generate(xk, yk, jax.random.PRNGKey(9))[0])
        return dict(ms_per_utt_iter=round(t * 1e3 / (4 * ITR), 2),
                    batch=4, iters=ITR, bucket_len=Lb)

    probe("kws_pgd", kws_probe)

    # ---------- grad_mode='full' PGD: pallas custom-VJP vs XLA -----------
    # VERDICT r1 weak#2: full-grad PGD was 612 ms/iter (XLA + remat) vs
    # 308 ms ref-mode; the custom-VJP fused kernel should close the gap.
    from cli.common import pallas_forward_fn

    Bf = 4
    xf = jax.random.normal(jax.random.PRNGKey(10), (Bf, 1, 16000)) * 0.1
    yf = jnp.zeros((Bf,), jnp.int32)
    def fullgrad_probe(impl):
        def run():
            if impl == "pallas":
                fwd = pallas_forward_fn("full")
                efn = lambda xx, tt: fwd(
                    wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
            else:
                efn = eps_fn
            dfn = RevDiffWave(efn, T=200, t=3, grad_mode="full", remat=True)
            sys_f = AcousticSystem(classifier, fe, dfn, "wave",
                                   defender_stochastic=True)
            # value-identical forward-only system for the prediction pass
            # (the CLI does the same when grad_mode='full'); must use the
            # SAME impl family as the grad pass so the pallas-vs-xla
            # probes isolate the eps-net implementation
            pred_eps = eps_pallas if impl == "pallas" else eps_fn
            dfn_ref = RevDiffWave(pred_eps, T=200, t=3, grad_mode="ref")
            sys_p = AcousticSystem(classifier, fe, dfn_ref, "wave",
                                   defender_stochastic=True)
            atkf = AudioAttack(lambda xx, kk: sys_f(xx, key=kk), eps=0.002,
                               max_iter_1=ITR, learning_rate_1=0.0004,
                               predict_model_fn=lambda xx, kk: sys_p(
                                   xx, key=kk))
            t = timeit(
                lambda: atkf.generate(xf, yf, jax.random.PRNGKey(11))[0])
            return dict(ms_per_pgd_iter=round(t * 1e3 / ITR, 1),
                        ms_per_utt_iter=round(t * 1e3 / (Bf * ITR), 2),
                        batch=Bf, iters=ITR, t_sde=3)
        return run

    for impl in ("pallas", "xla"):
        probe(f"fullgrad_pgd_{impl}", fullgrad_probe(impl))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
