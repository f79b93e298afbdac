"""Round-5b: f32 long-L rescue via w_hbm weight streaming.

Round-5a measured the f32 chunk_loop OOM at L=24000 as 143.55M of 128M
at every chunk size.  Decomposition: the double-buffered cycle weight
windows are ~50 MB of that (2 x 12 layers x (3*256*512 + 2*256*256)
f32), while the compute only ever touches one layer's ~2 MB at a time.
``w_hbm=True`` keeps the weights in HBM (ANY) and streams them through
a 2-slot VMEM scratch with per-layer prefetched DMAs (~4 MB resident),
which should bring L=24000 to ~96 MB and L=32000 to ~121 MB.

Arms (compile budget is the constraint — 5-15 min each via the remote
tunnel):
  1. w_hbm f32 b4 at L in {24000, 32000}: fit-or-OOM + perf vs the
     round-5a v4 fallback numbers (60.3%/61.4% of bf16 peak).
  2. w_hbm f32 b4 at L=16000: A/B vs the current chunk_loop winner
     (82.4% of peak) — is streaming also better inside the fitted band?
  3. numerics of any fitting arm vs the v4 auto-fallback at the same
     length (v4-vs-XLA parity is already pinned; v4 programs are warm
     from round-5a).
  4. b16 batch of the per-length winner (eval-shaped batch).

Outcome feeds `forward_dispatch_band`: add a "whbm" band for f32
L>16000 where it fits AND beats v4.
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

    def forced(chunk, w_hbm=True, chunk_loop=True):
        def fwd(params, audio, steps):
            p = params["params"]
            emb, h = wavenet_stem(p, audio, steps, 128, jnp.float32)
            stack_in = wavenet_stack_inputs(p, emb, 36, jnp.float32)
            skip = fused_residual_stack(
                h, *stack_in, dilation_cycle=12, chunk_l=chunk,
                hbm_io=True, chunk_loop=chunk_loop, w_hbm=w_hbm)
            return wavenet_head(p, skip, 36)
        return fwd

    def v4_fwd(p, a, s):
        return wavenet_forward_pallas(p, a, s, dtype=jnp.float32)

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

    for L in (24000, 32000, 16000):
        chunk = 2000
        probe(f"whbm_f32_L{L}_b4_chunk{chunk}",
              lambda L=L, chunk=chunk: dict(
                  **arm(forced(chunk), 4, L), chunk=chunk),
              results)
        fit = f"whbm_f32_L{L}_b4_chunk{chunk}" in results and \
            "error" not in results[f"whbm_f32_L{L}_b4_chunk{chunk}"]
        if not fit and L != 16000:
            # smaller chunk = smaller live set; one retry
            probe(f"whbm_f32_L{L}_b4_chunk1600",
                  lambda L=L: dict(**arm(forced(1600), 4, L),
                                   chunk=1600),
                  results)

    # numerics + eval-shaped batch for the longest fitting length
    for L in (32000, 24000):
        keys = [k for k in results if k.startswith(f"whbm_f32_L{L}_b4")
                and "error" not in results[k]]
        if not keys:
            continue
        cbest = min((results[k]["ms_per_fwd_batch"], results[k]["chunk"])
                    for k in keys)[1]

        def numerics(cbest=cbest, L=L):
            B = 2
            x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, L)) * 0.3
            t = jnp.full((B, 1), 5.0)
            ref = np.asarray(hoisted_jit(
                lambda p, xx: v4_fwd(p, xx, t))(wparams, x))
            got = np.asarray(hoisted_jit(
                lambda p, xx: forced(cbest)(p, xx, t))(wparams, x))
            diff = np.abs(got - ref)
            scale = np.abs(ref).max()
            return dict(max_abs_diff=float(diff.max()),
                        rel_to_max=float(diff.max() / scale),
                        ref_scale=float(scale), chunk=cbest)
        probe(f"whbm_f32_L{L}_numerics_vs_v4", numerics, results)
        probe(f"whbm_f32_L{L}_b16_chunk{cbest}",
              lambda cbest=cbest, L=L: dict(
                  **arm(forced(cbest), 16, L), chunk=cbest),
              results)
        break

    with open("/tmp/round5b_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
