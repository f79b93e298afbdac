"""Round-3f TPU probes: is v5x (hbm_io) faster than v5/v6 at L=16000?

v5x removed the per-cycle auto-pipelined re-DMA of the x/skip blocks
(BlockSpec index maps (b,0,0) re-fetch the same block every cycle grid
step) and measured 90.3% of bf16 peak at L=24000 — above v6's 87.7% at
L=16000, whose remaining-gap analysis blames exactly that re-DMA.
A/B the flagship length directly: fused_residual_stack with
hbm_io=False vs True (bf16 gates both sides), batch 16/256, plus the
end-to-end purify bench configuration at batch 384 if the micro wins.
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

    def chained(fn, x0, n=8):
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

    from audiopure_tpu.kernels.wavenet_block import (
        fused_residual_stack, pick_stack_chunk, wavenet_head,
        wavenet_stack_inputs, wavenet_stem)
    from audiopure_tpu.models.wavenet import WaveNet

    L = 16000
    GF = 0.604
    PEAK = 197.0
    net = WaveNet(dtype=jnp.bfloat16)
    wparams = net.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    p = wparams["params"]

    def fwd(x, hbm_io, chunk):
        t = jnp.zeros((x.shape[0], 1))
        emb, h = wavenet_stem(p, x, t, 128, jnp.bfloat16)
        stack_in = wavenet_stack_inputs(p, emb, 36, jnp.bfloat16)
        skip = fused_residual_stack(
            h, *stack_in, dilation_cycle=12, chunk_l=chunk,
            gate_dtype=jnp.bfloat16, hbm_io=hbm_io)
        return wavenet_head(p, skip, 36)

    def micro(B, hbm_io, chunk):
        def run():
            x = jax.random.normal(jax.random.PRNGKey(6), (B, 1, L)) * 0.3
            t = chained(lambda xx: fwd(xx, hbm_io, chunk).astype(
                jnp.float32), x)
            tf = GF * B / t
            return dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=B,
                        hbm_io=hbm_io, chunk=chunk,
                        tflops=round(tf, 1),
                        pct_bf16_peak=round(100 * tf / PEAK, 1))
        return run

    default_chunk = pick_stack_chunk(L, None)
    for B in (16, 256):
        probe(f"v5x_L16000_b{B}", micro(B, True, 1000))
        probe(f"v6_L16000_b{B}_regression", micro(B, False, default_chunk))
    # chunk sweep for the hbm_io variant (staging buffer size trade)
    for ch in (2000, 4000):
        if L % ch == 0:
            probe(f"v5x_L16000_b16_chunk{ch}", micro(16, True, ch))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
