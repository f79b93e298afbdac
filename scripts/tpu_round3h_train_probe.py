"""Round-3h: no-remat training at batch 10/12 — is 53% MFU batch-bound?

Batch 8 no-remat = 7.20 steps/s (53.0% MFU); batch 16 no-remat OOMs
(17.5G of 15.75G HBM). The activation residency is ~linear in batch
(~1.09G/utt + params/optimizer), so batch 12 should land ~13.5G —
inside HBM. If MFU rises, the production recipe moves to the largest
no-remat batch that fits.
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
    apply_fn = lambda p, xx, tt: net.apply(p, xx, tt).astype(jnp.float32)

    results = {}
    for B in (12, 10):
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
                     pct_bf16_peak=round(100 * step_tflop * sps / PEAK, 1),
                     batch=B, remat=False,
                     loss_first=round(loss0, 4),
                     loss_after=round(lossN, 4))
            results[f"train_noremat_b{B}"] = r
            print(json.dumps({"probe": f"train_noremat_b{B}", **r}),
                  flush=True)
            break  # largest fitting batch found
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(json.dumps({"probe": f"train_noremat_b{B}",
                              "error": str(e)[:200]}), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
