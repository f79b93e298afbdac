"""Round-3m: whole-net training VJP (wavenet_stack_train) on-chip.

Round 3 training recipe was XLA autodiff at batch 8 no-remat:
7.20 steps/s = 53.0% MFU (b10 collapses to 22.3%, b12+ crashes the
remote-compile helper). The new fused_stack_train custom VJP runs the
backward on the layer-resident kernel design (its input-grad sibling
measures 87-93% of bf16 peak) and shrinks the compiled program, so it
may both lift MFU and unlock deeper batches. HBM bound: h_all+x_all
streams cost ~0.88 GB/utt, so b8 ~7 GB, b12 ~10.6 GB, b16 ~14.1 GB
(b16 likely over with params+opt+head activations — try and report).

Probes: pallas_stack train step at b4/8/12(/16), XLA-autodiff b8
regression arm, and a 30-step loss-fall sanity on both.
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

    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.kernels.wavenet_stack_train import \
        wavenet_forward_pallas_train
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    L = 16000
    rng = np.random.RandomState(0)
    t_ax = np.arange(L) / 16000.0
    sched = make_schedule(200, 1e-4, 0.02)
    opt = optax.adam(2e-4)
    PEAK = 197.0
    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))

    kernel_fn = lambda p, xx, tt: wavenet_forward_pallas_train(
        p, xx, tt, dtype=jnp.bfloat16).astype(jnp.float32)
    xla_fn = lambda p, xx, tt: net.apply(p, xx, tt).astype(jnp.float32)

    results = {}

    def probe(name, apply_fn, B):
        try:
            freqs = rng.uniform(200, 2000, size=(B, 1))
            phases = rng.uniform(0, 2 * np.pi, size=(B, 1))
            x0 = jnp.asarray(
                (0.5 * np.sin(2 * np.pi * freqs * t_ax[None, :] + phases)
                 ).astype(np.float32)[:, None, :])
            step_fn = jax.jit(make_train_step(apply_fn, sched, opt),
                              donate_argnums=0)
            state = init_train_state(
                jax.tree_util.tree_map(jnp.copy, wparams), opt,
                jax.random.PRNGKey(11))
            state, loss = step_fn(state, x0)
            loss0 = float(loss)
            steps = 30
            t0 = time.perf_counter()
            for _ in range(steps):
                state, loss = step_fn(state, x0)
            lossN = float(loss)
            dt = time.perf_counter() - t0
            sps = steps / dt
            step_tflop = 3 * 0.604 * B
            r = dict(steps_per_sec=round(sps, 3),
                     ms_per_step=round(1e3 / sps, 1),
                     tflops=round(step_tflop * sps, 1),
                     pct_bf16_peak=round(100 * step_tflop * sps / PEAK,
                                         1),
                     batch=B,
                     loss_first=round(loss0, 4),
                     loss_after=round(lossN, 4))
            results[name] = r
            print(json.dumps({"probe": name, **r}), flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(json.dumps({"probe": name, "error": str(e)[:300]}),
                  flush=True)

    for B in (8, 4, 12, 16):
        probe(f"train_pallas_stack_b{B}", kernel_fn, B)
    probe("train_xla_b8_regression", xla_fn, 8)

    # ---- UNet (spec-path) training throughput — never benchmarked ----
    # TrainLoop's jitted step (microbatch scan, AdamW, 1x EMA), driven
    # directly so no per-step host sync lands in the timed region.
    # MFU model: 3 x 15.73 GF per image forward (the DiffSpec FLOP
    # denominator, docs/BENCH.md round-3 section).
    def unet_train(B, dtype_name):
        def run():
            from audiopure_tpu.diffusion.gaussian import \
                create_gaussian_diffusion
            from audiopure_tpu.models.unet import create_unet
            from audiopure_tpu.training.train_loop import TrainLoop

            dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
            unet = create_unet(dtype=dt)
            diffusion = create_gaussian_diffusion(
                steps=4000, noise_schedule="linear")
            uparams = jax.jit(unet.init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 1, 32, 32)),
                                         jnp.zeros((1,)))
            loop = TrainLoop(
                lambda p, x, t: unet.apply(p, x, t).astype(jnp.float32),
                uparams, diffusion, iter(()), batch_size=B, lr=1e-4)
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (B, 1, 32, 32)) * 0.5
            t = jnp.zeros((B,), jnp.int32) + 100
            w = jnp.ones((B,))
            params, opt_state, ema = loop.params, loop.opt_state, \
                loop.ema_params
            key = jax.random.PRNGKey(2)
            step_fn = loop._train_step
            params, opt_state, ema, loss, _, _ = step_fn(
                params, opt_state, ema, x, t, w, key, {})
            loss0 = float(loss)
            steps = 30
            t0 = time.perf_counter()
            for i in range(steps):
                params, opt_state, ema, loss, _, _ = step_fn(
                    params, opt_state, ema, x, t, w, key, {})
            lossN = float(loss)
            dtm = time.perf_counter() - t0
            sps = steps / dtm
            step_tflop = 3 * 15.73e-3 * B
            return dict(steps_per_sec=round(sps, 3),
                        ms_per_step=round(1e3 / sps, 1),
                        tflops=round(step_tflop * sps, 1),
                        pct_bf16_peak=round(
                            100 * step_tflop * sps / PEAK, 1),
                        batch=B, dtype=dtype_name,
                        loss_first=round(loss0, 4),
                        loss_after=round(lossN, 4))
        return run

    for B, dn in ((128, "bf16"), (128, "f32"), (256, "bf16")):
        try:
            results[f"unet_train_{dn}_b{B}"] = unet_train(B, dn)()
            print(json.dumps({"probe": f"unet_train_{dn}_b{B}",
                              **results[f"unet_train_{dn}_b{B}"]}),
                  flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(json.dumps({"probe": f"unet_train_{dn}_b{B}",
                              "error": str(e)[:300]}), flush=True)

    with open("/tmp/round3m_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
