"""Round-5c2: tighten the w_hbm upper boundary — L=36000 fit-or-OOM.

Round-5c measured fit at L=32000 (76.2% b4 / 86.4% b16) and OOM at
L=40000 (145.65M of 128M, by 17.65M).  The resident estimate puts the
crossover near 36000; probe it so the band's upper gate is pinned to
the nearest measured multiple-of-2000 on both sides.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from scripts.tpu_round3_probes import probe  # noqa


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

    import flax

    from audiopure_tpu.kernels.wavenet_block import (
        fused_residual_stack, wavenet_head, wavenet_stack_inputs,
        wavenet_stem)
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    PEAK = 197.0
    GF_PER_L = 0.906 / 24000.0
    net = WaveNet(dtype=jnp.float32)
    wparams = flax.core.unfreeze(net.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 1, 1600)),
        jnp.zeros((1, 1))))
    wparams["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(12),
        wparams["params"]["final_conv2"]["kernel"].shape) * 0.05

    def fwd(params, audio, steps):
        p = params["params"]
        emb, h = wavenet_stem(p, audio, steps, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(p, emb, 36, jnp.float32)
        skip = fused_residual_stack(
            h, *stack_in, dilation_cycle=12, chunk_l=2000,
            hbm_io=True, chunk_loop=True, w_hbm=True)
        return wavenet_head(p, skip, 36)

    def arm(B, L, n=8):
        x = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, L)) * 0.3
             ).astype(jnp.float32)
        t = jnp.full((B, 1), 5.0)

        @hoisted_jit
        def run(params, x0):
            def body(c, _):
                y = fwd(params, c, t)
                return (y / (jnp.abs(y).max() + 1e-6)).astype(x0.dtype), \
                    None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.abs(out).sum()

        float(run(wparams, x))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = float(run(wparams, x))
            best = min(best, time.perf_counter() - t0)
        assert s == s
        tsec = best / n
        tf = GF_PER_L * L * B / tsec
        return dict(ms_per_fwd_batch=round(tsec * 1e3, 2), batch=B,
                    L=L, tflops=round(tf, 1),
                    pct_bf16_peak=round(100 * tf / PEAK, 1))

    probe("whbm_f32_L36000_b4_chunk2000_fit_or_oom",
          lambda: arm(4, 36000), results)

    with open("/tmp/round5c2_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
