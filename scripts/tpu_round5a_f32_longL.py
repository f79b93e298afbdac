"""Round-5a: f32 v5x+chunk_loop fit/perf at L=24000 and L=32000.

VERDICT r4 item 3: the f32 chunk_loop band is pinned only at L<=16000
(round-4i); L>16000 falls to the v4 55-67%-of-peak band with the fit
"unmeasured past 16000".  That is exactly the KWS bucket regime
(`/root/reference/kws_adaptive_attack_eval.py:178`, buckets up to
~2.747 s = 43952 samples at 16 kHz).  This probe measures, same-session:

  1. fit-or-OOM + speed of forced v5x(chunk_loop) f32 at b4 for
     L in {24000, 32000} across chunk sizes (chunk must divide L and be
     a multiple of 16 for the Mosaic alignment hint);
  2. the v4 auto-fallback control at the same lengths (the band the
     dispatch currently picks);
  3. numerics of any fitting arm vs XLA f32;
  4. batch-16 of the per-length winner (the eval-shaped batch).

Outcome feeds `forward_dispatch_band`: extend the chunk_loop band past
16000 where it fits AND beats v4, else pin the measured v4 boundary.
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
    import numpy as np

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

    def forced_v5x(chunk):
        def fwd(params, audio, steps):
            p = params["params"]
            emb, h = wavenet_stem(p, audio, steps, 128, jnp.float32)
            stack_in = wavenet_stack_inputs(p, emb, 36, jnp.float32)
            skip = fused_residual_stack(
                h, *stack_in, dilation_cycle=12, chunk_l=chunk,
                hbm_io=True, chunk_loop=True)
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

    for L in (24000, 32000):
        # chunk must divide L and satisfy chunk % 16 == 0; 2000 is the
        # L=16000 winner, 1600 the smaller-footprint fallback, 4000 the
        # known-OOM upper control at 16000 (re-probed only at 24000)
        chunks = (1600, 2000) if L == 32000 else (1600, 2000, 4000)
        for chunk in chunks:
            if L % chunk:
                continue
            probe(f"v5x_f32_chunkloop_L{L}_b4_chunk{chunk}",
                  lambda chunk=chunk, L=L: dict(
                      **arm(forced_v5x(chunk), 4, L), chunk=chunk),
                  results)
        probe(f"v4_f32_control_L{L}_b4",
              lambda L=L: arm(lambda p, a, s: wavenet_forward_pallas(
                  p, a, s, dtype=jnp.float32), 4, L), results)

        fits = {int(k.rsplit("chunk", 1)[1]):
                results[k]["ms_per_fwd_batch"]
                for k in results
                if k.startswith(f"v5x_f32_chunkloop_L{L}_b4")
                and "error" not in results[k]}
        if fits:
            cbest = min(fits, key=fits.get)
            probe(f"v5x_f32_chunkloop_L{L}_b16_chunk{cbest}",
                  lambda cbest=cbest, L=L: dict(
                      **arm(forced_v5x(cbest), 16, L), chunk=cbest),
                  results)

            def numerics(cbest=cbest, L=L):
                B = 2
                x = jax.random.normal(jax.random.PRNGKey(3),
                                      (B, 1, L)) * 0.3
                t = jnp.full((B, 1), 5.0)
                ref = np.asarray(hoisted_jit(
                    lambda p, xx: net.apply(p, xx, t))(wparams, x))
                got = np.asarray(hoisted_jit(
                    lambda p, xx: forced_v5x(cbest)(p, xx, t))(
                        wparams, x))
                diff = np.abs(got - ref)
                scale = np.abs(ref).max()
                return dict(max_abs_diff=float(diff.max()),
                            rel_to_max=float(diff.max() / scale),
                            ref_scale=float(scale), chunk=cbest)
            probe(f"v5x_f32_chunkloop_L{L}_numerics", numerics, results)

    with open("/tmp/round5a_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
