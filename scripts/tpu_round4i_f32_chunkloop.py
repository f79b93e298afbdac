"""Round-4i: the chunk_loop VMEM fit — v5x f32 at L=16000 on-chip.

Round-4h measured the v5x (hbm_io) whole-net forward OOMing at f32
L=16000 for every chunk size (156.7-158.0 M of 128 M), with the single
largest allocation being ~50 MB of register-allocator SPILL SLOTS from
the fully unrolled 12-layer x n-chunk kernel body.  ``chunk_loop=True``
(wavenet_block.py) replaces the unrolled chunk loop with ONE compiled
lax.fori_loop body (pl.ds dynamic slices, uniform boundary mask) —
bit-identical on the interpret path (tests/test_pallas_kernel.py) —
to bound register pressure.  This probe measures, same-session:

  1. fit-or-OOM + speed of forced v5x(chunk_loop) f32 at b4 across
     chunk sizes, vs the v4 auto fallback (4h control: 22.19 ms/b4,
     55.3% of bf16 peak);
  2. the batch-16 pairing vs round-3g's v4 figure (73.99 ms/b16,
     130.6 TF/s) — re-measured here so the A/B is same-session;
  3. numerics of the winner vs XLA f32 (same bf16-multiply matmul
     convention both sides);
  4. whether chunk_loop costs anything at bf16 (the 84-93.6%-of-peak
     production path stays unrolled unless this measures a win).
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

    L = 16000
    PEAK = 197.0
    GF_PER_L = 0.906 / 24000.0
    net = WaveNet(dtype=jnp.float32)
    wparams = flax.core.unfreeze(net.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 1, L)), jnp.zeros((1, 1))))
    wparams["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(12),
        wparams["params"]["final_conv2"]["kernel"].shape) * 0.05

    def forced_v5x(chunk, dt=jnp.float32, gate_dtype=None,
                   hbm_io=True, chunk_loop=True):
        def fwd(params, audio, steps):
            p = params["params"]
            emb, h = wavenet_stem(p, audio, steps, 128, dt)
            stack_in = wavenet_stack_inputs(p, emb, 36, dt)
            skip = fused_residual_stack(
                h, *stack_in, dilation_cycle=12, chunk_l=chunk,
                hbm_io=hbm_io, chunk_loop=chunk_loop,
                gate_dtype=gate_dtype)
            return wavenet_head(p, skip, 36)
        return fwd

    def chained(fn, B, dt=jnp.float32, n=8):
        x = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, L)) * 0.3
             ).astype(dt)
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

    def arm(fn, B, dt=jnp.float32):
        tsec = chained(fn, B, dt)
        tf = GF_PER_L * L * B / tsec
        return dict(ms_per_fwd_batch=round(tsec * 1e3, 2), batch=B,
                    tflops=round(tf, 1),
                    pct_bf16_peak=round(100 * tf / PEAK, 1))

    # 1. fit + speed across chunks, b4 (4h control: 22.19 ms, 55.3%)
    # chunk_loop needs chunk_l % 16 == 0 (dynamic slice starts carry a
    # pl.multiple_of(ALIGN) hint; first attempt with chunk=1000 died in
    # Mosaic: "cannot statically prove index is a multiple of 8")
    for chunk in (800, 2000, 4000):
        probe(f"v5x_f32_chunkloop_b4_chunk{chunk}",
              lambda chunk=chunk: dict(**arm(forced_v5x(chunk), 4),
                                       chunk=chunk), results)

    # 2. batch-16 pairing: v4 control re-measured same-session
    probe("v4_f32_control_b16",
          lambda: arm(lambda p, a, s: wavenet_forward_pallas(
              p, a, s, dtype=jnp.float32), 16), results)
    best_fit = [int(k.rsplit("chunk", 1)[1])
                for k, v in results.items()
                if k.startswith("v5x_f32_chunkloop_b4") and "error" not
                in v]
    if best_fit:
        bests = {c: results[f"v5x_f32_chunkloop_b4_chunk{c}"][
            "ms_per_fwd_batch"] for c in best_fit}
        cbest = min(bests, key=bests.get)
        probe(f"v5x_f32_chunkloop_b16_chunk{cbest}",
              lambda: dict(**arm(forced_v5x(cbest), 16), chunk=cbest),
              results)

        # 3. numerics of the winner vs XLA f32
        def numerics():
            B = 4
            x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, L)) * 0.3
            t = jnp.full((B, 1), 5.0)
            ref = np.asarray(hoisted_jit(
                lambda p, xx: net.apply(p, xx, t))(wparams, x))
            got = np.asarray(hoisted_jit(
                lambda p, xx: forced_v5x(cbest)(p, xx, t))(wparams, x))
            diff = np.abs(got - ref)
            scale = np.abs(ref).max()
            return dict(max_abs_diff=float(diff.max()),
                        rel_to_max=float(diff.max() / scale),
                        ref_scale=float(scale), chunk=cbest)
        probe("v5x_f32_chunkloop_numerics_vs_xla", numerics, results)

    # 4. bf16: does chunk_loop cost anything on the production path?
    for loop in (False, True):
        probe(f"v5_bf16_b4_chunkloop_{loop}",
              lambda loop=loop: arm(forced_v5x(
                  4000, dt=jnp.bfloat16, gate_dtype=jnp.bfloat16,
                  hbm_io=False, chunk_loop=loop), 4, jnp.bfloat16),
              results)

    with open("/tmp/round4i_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
