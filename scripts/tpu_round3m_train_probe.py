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

    with open("/tmp/round3m_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
