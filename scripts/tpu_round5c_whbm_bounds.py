"""Round-5c: pin the whbm band boundary + the eval-batch control.

Round-5b measured whbm f32 fits at L=24000 (74.6%) and L=32000 (76.2%
b4, 86.4% b16), bit-exact vs v4.  Two gaps before the dispatch band can
claim measurement on both sides:

  1. the upper boundary: the resident estimate says L=36000+ blows the
     ceiling again (state 2*(L+2*4096)*256*4 + skip L*256*4 alone is
     ~134 MB at 36000) — probe L=40000 fit-or-OOM;
  2. the b16 v4 control at L=32000 (round-5a only has b4 controls), so
     the eval-shaped-batch ratio is measured, not inferred.
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
        wavenet_stem, wavenet_forward_pallas)
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

    def forced(chunk):
        def fwd(params, audio, steps):
            p = params["params"]
            emb, h = wavenet_stem(p, audio, steps, 128, jnp.float32)
            stack_in = wavenet_stack_inputs(p, emb, 36, jnp.float32)
            skip = fused_residual_stack(
                h, *stack_in, dilation_cycle=12, chunk_l=chunk,
                hbm_io=True, chunk_loop=True, w_hbm=True)
            return wavenet_head(p, skip, 36)
        return fwd

    def chained(fn, B, L, n=8):
        x = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, L)) * 0.3
             ).astype(jnp.float32)
        t = jnp.full((B, 1), 5.0)

        @hoisted_jit
        def run(params, x0):
            def body(c, _):
                y = fn(params, c, t)
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
        return best / n

    def arm(fn, B, L):
        tsec = chained(fn, B, L)
        tf = GF_PER_L * L * B / tsec
        return dict(ms_per_fwd_batch=round(tsec * 1e3, 2), batch=B,
                    L=L, tflops=round(tf, 1),
                    pct_bf16_peak=round(100 * tf / PEAK, 1))

    probe("whbm_f32_L40000_b4_chunk2000_fit_or_oom",
          lambda: dict(**arm(forced(2000), 4, 40000), chunk=2000),
          results)
    probe("v4_f32_control_L32000_b16",
          lambda: arm(lambda p, a, s: wavenet_forward_pallas(
              p, a, s, dtype=jnp.float32), 16, 32000), results)

    with open("/tmp/round5c_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)
    print(json.dumps(results, indent=1)[:2000])


if __name__ == "__main__":
    main()
