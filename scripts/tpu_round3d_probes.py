"""Round-3d TPU probes: hbm_io full-grad long audio + gates-b16 retry.

1. Whole-net input-grad VJP at L=24000 (KWS bucket): the new hbm_io
   save_h/backward kernels (wavenet_stack_grad) vs the per-layer VJP
   fallback that handled this length before. On-chip numerics check vs
   f32 XLA autodiff first, then chained-scan timing at batch 4.
2. KWS full-grad PGD attack (grad_mode='full') at L=24000 batch 4 —
   the stronger-adaptive-attack mode at bucket lengths, which round 3
   could only run through the per-layer kernel.
3. train remat='gates' batch 16 retry (r3c hit a remote-compile HTTP
   500 on this program; one retry to decide transient vs persistent).
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

    from audiopure_tpu.kernels.wavenet_block_grad import \
        wavenet_forward_pallas_grad
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        wavenet_forward_pallas_input_grad
    from audiopure_tpu.models.wavenet import WaveNet

    L = 24000
    GF_FWD = 0.906          # TFLOP per utt forward at L=24000
    PEAK = 197.0
    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    netf32 = WaveNet(dtype=jnp.float32)

    # ---- 1a. numerics: hbm_io grad vs f32 XLA autodiff -----------------
    def numerics():
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, L)) * 0.3
        t = jnp.full((2, 1), 5.0)
        ct = jax.random.normal(jax.random.PRNGKey(4), (2, 1, L)) * 0.1
        g_ref = jax.jit(jax.grad(lambda xx: (
            netf32.apply(wparams, xx, t) * ct).sum()))(x)
        g_hbm = jax.jit(jax.grad(lambda xx: (
            wavenet_forward_pallas_input_grad(
                wparams, xx, t, dtype=jnp.bfloat16).astype(jnp.float32)
            * ct).sum()))(x)
        ref = np.asarray(g_ref)
        diff = np.abs(np.asarray(g_hbm) - ref)
        scale = np.abs(ref).max()
        return dict(max_abs_diff=float(diff.max()),
                    rel_to_max=float(diff.max() / scale),
                    ref_scale=float(scale))

    probe("fullgrad_hbm_io_numerics_L24000", numerics)

    # ---- 1b. timing: hbm_io whole-net VJP vs per-layer fallback --------
    def grad_probe(fwd_fn, B, label):
        def run():
            x = jax.random.normal(jax.random.PRNGKey(5), (B, 1, L)) * 0.3
            t = jnp.full((B, 1), 5.0)
            gfn = jax.grad(lambda xx: (fwd_fn(
                wparams, xx, t, dtype=jnp.bfloat16).astype(
                    jnp.float32) ** 2).sum())
            tsec = chained(gfn, x, 8)
            tf = 3 * GF_FWD * B / tsec
            return dict(ms_per_grad_batch=round(tsec * 1e3, 2), batch=B,
                        L=L, kernel=label, tflops=round(tf, 1),
                        pct_bf16_peak=round(100 * tf / PEAK, 1))
        return run

    probe("fullgrad_hbm_io_chained_b4",
          grad_probe(wavenet_forward_pallas_input_grad, 4, "hbm_io"))
    probe("fullgrad_perlayer_chained_b4",
          grad_probe(wavenet_forward_pallas_grad, 4, "per-layer"))

    # ---- 2. KWS full-grad PGD attack at bucket length ------------------
    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd

    def kws_fullgrad_attack(Bk):
        def run():
            ITR = 5
            fe40 = MelFrontEnd(n_mels=40)
            kws = create_classifier("kwsmodel", num_classes=4)
            xk = jax.random.normal(jax.random.PRNGKey(7),
                                   (Bk, 1, L)) * 0.1
            kvars = kws.init(jax.random.PRNGKey(8), fe40(xk[:1]))
            kclf = lambda ss: kws.apply(kvars, ss)
            eps = lambda xx, tt: wavenet_forward_pallas_input_grad(
                wparams, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
            wave_def = RevDiffWave(eps, T=200, t=3, grad_mode="full")
            sys_kws = AcousticSystem(kclf, fe40, wave_def, "wave",
                                     defender_stochastic=True)
            atk = AudioAttack(lambda xx, kk: sys_kws(xx, key=kk),
                              eps=0.002, max_iter_1=ITR,
                              learning_rate_1=0.0004)
            yk = jnp.zeros((Bk,), jnp.int32)

            def attack(k):
                return atk.generate(xk, yk, k)[0]

            np.asarray(attack(jax.random.PRNGKey(9)))
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                out = np.asarray(attack(jax.random.PRNGKey(10 + rep)))
                best = min(best, time.perf_counter() - t0)
            assert np.abs(out - np.asarray(xk)).max() > 0
            return dict(ms_per_utt_iter=round(best * 1e3 / (Bk * ITR), 2),
                        batch=Bk, iters=ITR, bucket_len=L,
                        grad_mode="full")
        return run

    probe("kws_fullgrad_attack_b4", kws_fullgrad_attack(4))

    # ---- 3. gates b16 retry --------------------------------------------
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    def train_gates_b16():
        B, steps = 16, 30
        rng = np.random.RandomState(0)
        t_ax = np.arange(16000) / 16000.0
        freqs = rng.uniform(200, 2000, size=(B, 1))
        phases = rng.uniform(0, 2 * np.pi, size=(B, 1))
        x0 = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * freqs * t_ax[None, :] + phases)
             ).astype(np.float32)[:, None, :])
        sched = make_schedule(200, 1e-4, 0.02)
        opt = optax.adam(2e-4)
        net_r = WaveNet(dtype=jnp.bfloat16, remat="gates")
        p16 = net_r.init(jax.random.PRNGKey(2),
                         jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
        apply_fn = lambda p, xx, tt: net_r.apply(p, xx, tt).astype(
            jnp.float32)
        step_fn = jax.jit(make_train_step(apply_fn, sched, opt),
                          donate_argnums=0)
        state = init_train_state(p16, opt, jax.random.PRNGKey(11))
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
                    pct_bf16_peak=round(100 * step_tflop * sps / PEAK, 1),
                    batch=B, remat="gates",
                    loss_first=round(loss0, 4), loss_after=round(lossN, 4))

    probe("train_gates_b16_retry", train_gates_b16)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
